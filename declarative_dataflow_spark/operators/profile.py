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

    return kl_from_counts(counts(a, "ca"), counts(b, "cb"), round_to)


def kl_from_counts(
    ca: DataFrame, cb: DataFrame, round_to: int = 6
) -> DataFrame:
    """The divergence fold of :func:`token_kl_shift`, from two
    (token, count) tables — shared with the incremental maintainer
    (streaming/corpus_stats.py::IncrementalTokenKL), whose state IS
    such a pair of count tables."""

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


def embed_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-distribution drift between two corpus slices: one row
    ``(cos_means, norm_ratio, n_a, n_b)`` — cosine between the two
    slices' MEAN vectors, the ratio of the mean-vector norms, and the
    slice sizes. The embedding-side complement of
    :func:`token_kl_shift`: a cos_means dip or norm_ratio swing means
    the new slice occupies a different region of embedding space (new
    domain, new encoder version, a broken featurizer) before any
    index is rebuilt on it.

    Shape: each slice's dimension-wise mean comes from ONE
    posexplode -> groupBy(dim) aggregate — the dim key has only
    ``d`` values, but map-side partial aggregation reduces every
    partition to d rows before the shuffle, so the exchange is
    d x partitions rows regardless of corpus size. The two d-row mean
    tables join on dim (broadcast, d rows) and fold to the scalar
    outputs. Results round to ``round_to`` decimals (summation-order
    noise vs the DuckDB twin)."""

    def dim_means(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .groupBy("dim")
            .agg(F.avg("x").alias(out))
        )

    ma, mb = dim_means(a, "ma"), dim_means(b, "mb")
    na = a.select(F.count(F.lit(1)).alias("n_a"))
    nb = b.select(F.count(F.lit(1)).alias("n_b"))
    return drift_from_means(ma, mb, na, nb, round_to)


def drift_from_means(
    ma: DataFrame,
    mb: DataFrame,
    na: DataFrame,
    nb: DataFrame,
    round_to: int = 6,
) -> DataFrame:
    """The scalar fold of :func:`embed_drift`, from two (dim, mean)
    tables and two one-row count tables — shared with the incremental
    maintainer (streaming/corpus_stats.py::IncrementalEmbedDrift),
    whose state consolidates to exactly these inputs."""

    folded = (
        ma.join(mb, "dim")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("la"),
            F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("lb"),
        )
    )
    return (
        folded.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.round(
                F.col("dot") / (F.col("la") * F.col("lb")), round_to
            ).alias("cos_means"),
            F.round(F.col("lb") / F.col("la"), round_to).alias("norm_ratio"),
            "n_a",
            "n_b",
        )
    )
