"""Deterministic sampling and splitting for training-data pipelines.

Beyond-reference extensions: corpus curation needs reproducible
train/validation splits and per-stratum downsampling that give the
SAME assignment on every run, every engine, and every cluster size —
so randomness comes from a content hash, never from RNG state.
Everything is a pure column expression (JVM-side, no shuffle, no UDF),
mirrored exactly by the DuckDB oracle.

Scale design: both operators are map-only — at 100 TB they fuse into
whatever scan precedes them; the split column can also serve as a
partition key for writing split-separated output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# uint32 from md5, as in dedup.py — portable to DuckDB.
def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


HASH_SPACE = 4294967296  # 2^32


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row to a named split with probability proportional
    to ``weights`` — deterministic in (id, salt): (id, ..., split).

    The unit interval is cut into cumulative-weight segments and each
    row lands by its hashed position; changing the salt re-deals the
    assignment without touching the data.
    """

    total = sum(weights.values())
    h = _h32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    pos = h / F.lit(float(HASH_SPACE))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = pos < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: strata not in
    ``fractions`` keep ``default_fraction``. Same hash positions as
    hash_split (different salt), so sampling composes with splitting
    without correlation.
    """

    h = _h32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    pos = h / F.lit(float(HASH_SPACE))
    frac = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        frac = (
            F.when(cond, F.lit(f))
            if frac is None
            else frac.when(cond, F.lit(f))
        )
    frac = (
        F.lit(default_fraction)
        if frac is None
        else frac.otherwise(F.lit(default_fraction))
    )
    return docs.filter(pos < frac)
