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
