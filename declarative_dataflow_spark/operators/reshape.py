"""Relational reshaping: pivot (long→wide) and unpivot (wide→long).

The reference's Plan DSL has no reshape variants (its Project/
Aggregate family keeps relations long), but any analytics engine that
feeds BI tables or per-category feature columns needs both directions;
these are beyond-reference extensions in the TopK spirit
(plan/compiler.py:1314). Spark-first: pivot compiles to ONE hash
aggregate with conditional-sum columns when the pivot values are
pinned (never the two-pass distinct-then-aggregate of the open-ended
form), and unpivot uses the built-in Expand (one generator row per
metric, no join, no shuffle).

Cross-engine note: the declared queries pin the pivot value list
explicitly — an open-ended ``pivot(col)`` makes Spark run a distinct
pass AND makes the output schema data-dependent, which breaks both
the 100 TB plan (extra corpus pass) and the oracle contract (column
set must be stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pivot_counts(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: list,
    prefix: str = "n_",
) -> DataFrame:
    """Wide count table: one row per ``key_col``, one ``prefix+value``
    BIGINT column per pinned pivot value counting that value's rows —
    the activity matrix (entity × event-kind counts) behind feature
    tables and drift dashboards. Values outside ``values`` are
    ignored (pin the list deliberately; an open pivot is a schema
    landmine at 100 TB — see module docstring).

    Shape: ONE hash aggregate of conditional sums with map-side
    partial combine — the shuffle carries |keys| x |values| skinny
    partials, never the events."""

    if not values:
        raise ValueError("pivot_counts: values must be non-empty")
    aggs = [
        F.sum(
            F.when(F.col(pivot_col) == F.lit(v), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias(f"{prefix}{v}")
        for v in values
    ]
    return df.groupBy(F.col(key_col)).agg(*aggs)


def unpivot_metrics(
    df: DataFrame,
    id_cols: list,
    metric_cols: list,
    var_name: str = "metric",
    value_name: str = "val",
) -> DataFrame:
    """Long form of a wide metric table: (id_cols..., metric, val) —
    one output row per (input row, metric column), values cast to
    DOUBLE (the common supertype discipline: unpivot requires one
    value type). The inverse of :func:`pivot_counts`, and the shape
    metric stores, plotting layers, and per-metric aggregations want.

    Shape: Spark's built-in ``unpivot`` (Expand) — a map-side
    generator, no shuffle, no join; output is |rows| x |metrics| but
    streams through the scan."""

    if not metric_cols:
        raise ValueError("unpivot_metrics: metric_cols must be non-empty")
    wide = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in metric_cols],
    )
    return wide.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in metric_cols],
        var_name,
        value_name,
    )
