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
from pyspark.sql.window import Window


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


def count_window_agg(
    df: DataFrame,
    n: int,
    key_cols: list,
    order_cols: list,
    aggs: dict,
) -> DataFrame:
    """COUNT-based tumbling windows: each key's rows, in
    ``order_cols`` order, chop into consecutive windows of exactly
    ``n`` rows (the last window may be partial) — the "every N events"
    trigger the time-based windows can't express (micro-batching by
    volume, fixed-size training shards per key, N-trade bars in
    finance). Returns the key columns, ``win_seq`` (0-based window
    index), ``n_rows``, and the requested aggregates.

    Shape: ONE key-partitioned row_number window ((row_number-1) div n
    = the window id — per-key partitions, the sessionize discipline,
    never a global sort) + one (key, win_seq) aggregation. Ties in
    ``order_cols`` must be broken by a unique column for cross-engine
    determinism — pass one (e.g. an event id) as the last entry."""

    if n < 1:
        # n=0 would make (__rn - 1) DIV 0 a silent NULL win_seq,
        # collapsing every key into one NULL window (the ktruss
        # max_iters discipline: fail loudly, never degrade silently)
        raise ValueError(f"count_window_agg requires n >= 1, got {n}")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    # exact integer DIV, never a float quotient (the winsorize/prefix
    # discipline: a double quotient of an exact multiple can round up)
    assigned = df.withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("win_seq", F.expr(f"CAST((__rn - 1) DIV {n} AS BIGINT)"))
    agg_cols = [
        F.expr(expr).alias(name) for name, expr in aggs.items()
    ]
    return assigned.groupBy(*key_cols, "win_seq").agg(
        F.count(F.lit(1)).alias("n_rows"), *agg_cols
    )
