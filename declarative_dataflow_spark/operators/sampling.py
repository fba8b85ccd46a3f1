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


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis 2006, A-Res): each row gets key = ln(u) / w with u in
    (0, 1] drawn from the content hash, and the k LARGEST keys win —
    exactly the distribution of sequentially drawing k rows with
    probability proportional to weight, but computed as one map-only
    projection plus a top-k. Rows with weight <= 0 are excluded.
    Returns (id, w, sample_key), sorted nowhere (the selection is the
    contract, not the order).

    Scale shape: the key is a pure column expression; the top-k lowers
    to TakeOrderedAndProject (per-partition k-heaps, no global sort) —
    the same plan discipline as vocab_topk. Keys round to 12 decimals
    so the ln() is engine-portable; ties break by id.
    """

    u = (
        _h32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))) + 1
    ) / F.lit(float(HASH_SPACE))
    keyed = (
        docs.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias("w"),
            F.round(F.log(u) / F.col(weight_col), 12).alias("sample_key"),
        )
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    ).limit(k)
