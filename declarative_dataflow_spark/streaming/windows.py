"""Event-time windowing + watermarks: the Spark mapping of the
reference's output coarsening and trace slack.

- ``Coarsen`` (round timestamps up to window multiples,
  src/timestamp/mod.rs:144-184) -> tumbling ``F.window``.
- ``trace_slack`` (how far indexes may lag the frontier,
  src/lib.rs:394-396) -> ``withWatermark`` delay: both bound how late
  data may arrive before being excluded from compacted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_agg(
    stream: DataFrame,
    time_col: str,
    window: str,
    watermark: str,
    key_cols: list[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Windowed grouped aggregation with late-data bound.

    ``aggs`` maps output name -> SQL aggregate expression, e.g.
    {"n": "count(*)", "total": "sum(value)"}.
    """

    exprs = [F.expr(e).alias(name) for name, e in aggs.items()]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window), *key_cols)
        .agg(*exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *key_cols,
            *[F.col(name) for name in aggs],
        )
    )


def coarsen(df: DataFrame, time_col: str, window: str) -> DataFrame:
    """Batch analog of Coarsen: assign each row its tumbling-window end
    (the reference rounds UP to the next multiple)."""

    return df.withColumn(
        "__w", F.window(F.col(time_col), window)
    ).withColumn("coarsened", F.col("__w.end")).drop("__w")


def sliding_agg(
    stream: DataFrame,
    time_col: str,
    window: str,
    slide: str,
    watermark: str,
    key_cols: list[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Sliding-window grouped aggregation (beyond-reference: the
    reference only coarsens to tumbling multiples; Spark's window()
    assigns each row to window/slide overlapping panes natively, state
    bounded by the watermark)."""

    exprs = [F.expr(e).alias(name) for name, e in aggs.items()]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window, slide), *key_cols)
        .agg(*exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *key_cols,
            *[F.col(name) for name in aggs],
        )
    )


def session_agg(
    stream: DataFrame,
    time_col: str,
    gap: str,
    watermark: str,
    key_cols: list[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Session-window grouped aggregation: windows extend while events
    arrive within ``gap`` of each other and close at the watermark
    (F.session_window — merging-window state Spark manages natively)."""

    exprs = [F.expr(e).alias(name) for name, e in aggs.items()]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap), *key_cols)
        .agg(*exprs)
        .select(
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            *key_cols,
            *[F.col(name) for name in aggs],
        )
    )
