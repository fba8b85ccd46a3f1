"""Corpus profiling: one-pass per-column statistics.

Beyond-reference extension (BASELINE.json north star): the first step
against an unfamiliar 100 TB corpus is a data card — row counts, null
fractions, cardinalities, value ranges per column — and it has to come
from ONE pass, not one scan per column. ``corpus_profile`` builds every
column's (non-null count, distinct count, min, max) in a single
aggregate: Catalyst plans the multi-distinct via one Expand (each input
row fans out once per distinct column, then two hash aggregates with
map-side partial combine), so the corpus is read exactly once no matter
how many columns are profiled. The wide one-row result is then unpivoted
driver-side-free into one row per column.

``exact=False`` swaps countDistinct for approx_count_distinct
(HyperLogLog++, constant state, no Expand) — the 100 TB default; the
exact form exists for the oracle gate and modest corpora.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def corpus_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact: bool = True,
) -> DataFrame:
    """(col, n_rows, n_nonnull, n_nulls, ndv, min_val, max_val) — one
    row per profiled column, ordered by column name.

    min/max aggregate in the column's NATIVE type (so numerics order
    numerically) and cast to string afterwards for the uniform schema.
    With ``exact=False`` ndv is the HyperLogLog++ estimate
    (approx_count_distinct) — use that at scale; the plan loses the
    Expand and keeps constant aggregation state.
    """

    cols = list(columns) if columns is not None else list(df.columns)
    ndv = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("ndv"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in sorted(cols)
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def token_kl_shift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Unigram-distribution drift between two corpus slices: one row
    ``(kl_ab, kl_ba, js, vocab)`` — KL(P||Q), KL(Q||P), Jensen-Shannon
    divergence, and the union vocabulary size, over add-one-smoothed
    token distributions (smoothing makes both KLs finite on disjoint
    vocabularies).

    The monitor a training-data mixer runs when a new snapshot or
    source lands: a JS spike against the previous mix means the token
    distribution moved (new language, new boilerplate, a broken
    extractor) before any model sees it.

    Shape: each slice is one explode -> token-count aggregate (map-side
    combine, uniform keys); the two count tables full-outer join on
    token (one shuffle each side); the divergences are ONE global
    aggregate over per-token terms. Linear in tokens, state = vocab
    counts — at 100 TB the join keys are tokens, whose frequency skew
    does not matter because the join is 1:1 on distinct tokens.
    Results round to ``round_to`` decimals (1e-12-scale double
    summation-order noise must not break byte-compare gates; the
    DuckDB twin rounds identically).
    """

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), " ")
                ).alias("token")
            )
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ca, cb = counts(a, "ca"), counts(b, "cb")
    merged = ca.join(cb, "token", "full_outer").select(
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    # Add-one smoothing over the UNION vocabulary: p = (ca+1)/(NA+V),
    # q = (cb+1)/(NB+V). The totals (V = count(*), NA = sum(ca),
    # NB = sum(cb)) are one tiny aggregate broadcast back — never a
    # driver-side collect of the vocabulary.
    totals = merged.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    joined = merged.crossJoin(F.broadcast(totals))
    p = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    q = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    m = (p + q) / 2
    out = joined.agg(
        F.round(F.sum(p * F.log(p / q)), round_to).alias("kl_ab"),
        F.round(F.sum(q * F.log(q / p)), round_to).alias("kl_ba"),
        F.round(
            (F.sum(p * F.log(p / m)) + F.sum(q * F.log(q / m))) / 2,
            round_to,
        ).alias("js"),
        F.max("v").alias("vocab"),
    )
    return out
