"""Time-series operators over event streams: bucketized interval
(range) joins and per-key rolling-window features.

Beyond-reference extensions: the reference's event handling stops at
windows and bitemporal snapshots (SURVEY §2.5/§2.6); feature pipelines
over event logs additionally need "events within an interval" joins
and trailing-window statistics. Both are shaped for 100 TB:

- ``interval_join``: a naive ``t BETWEEN s AND e`` join is a
  BroadcastNestedLoopJoin (quadratic per key-group, and Spark will
  happily emit a cartesian for it). Instead, both sides land in
  fixed-width time buckets: the point side maps to ONE bucket, the
  interval side replicates to ceil(duration / bucket) + 1 buckets
  (a small constant when the bucket width is chosen >= the typical
  duration), and the join becomes an EQUI-join on (key, bucket) with
  a residual range filter. Each (point, interval) match is produced
  exactly once because the point lives in exactly one bucket — no
  dedup pass. The shuffle key (key, bucket) is uniform even when a
  single logical key is hot across time, because time spreads it.
- ``rolling_stats``: trailing-range window PARTITIONED by key —
  parallel across keys, never a global sort. Sums run in
  DECIMAL(18,6) so the result is order-independent (the PageRank
  discipline); a double sum would let the physical plan pick the
  last digit.

Both are pure DataFrame compositions of JVM-side expressions with
exact DuckDB twins (range semantics over epoch microseconds are
identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_us(col_name: str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP_NTZ column,
    timezone-independent (``unix_micros`` rejects NTZ, and casting
    through TIMESTAMP would shift by the session zone). DuckDB twin:
    ``epoch_us(ts)`` — both treat the naive value as-is."""

    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({col_name} AS TIMESTAMP_NTZ))"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join point rows to every interval row (same ``on`` keys) whose
    [start, end] contains the point's timestamp — inclusive on both
    ends. Returns points' columns plus the intervals' columns.

    The caller picks ``bucket_seconds`` near the typical interval
    duration: the interval side replicates once per covered bucket, so
    a bucket much smaller than the duration multiplies the shuffle
    volume, while a bucket much larger keeps the residual filter busy
    discarding non-matches. Correct for any choice.
    """

    us = bucket_seconds * 1_000_000
    pt = points.withColumn("__bin", F.floor(_epoch_us(ts_col) / us))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_us(start_col) / us),
                F.floor(_epoch_us(end_col) / us),
            )
        ),
    )
    joined = pt.join(iv, on + ["__bin"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def rolling_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key trailing-window statistics: for every event, the count,
    mean, and max of ``value_col`` over this key's events in the
    preceding ``window_seconds`` (inclusive of the current event).
    Returns (id, key, n_win, avg_win, max_win).

    RANGE frame over epoch microseconds — peers with identical
    timestamps are all included, so the result is deterministic
    without a tiebreak. The mean divides an exact DECIMAL sum and
    rounds to 6 decimals.
    """

    w = (
        Window.partitionBy(key_col)
        .orderBy(_epoch_us(ts_col))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    v = F.col(value_col).cast("decimal(18,6)")
    return events.select(
        F.col(id_col),
        F.col(key_col),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.round(
            F.sum(v).over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("avg_win"),
        F.max(v).over(w).cast("double").alias("max_win"),
    )


def asof_join(
    points: DataFrame,
    quotes: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    quote_ts_col: str = "ts",
    point_id_col: str = "event_id",
    quote_id_col: str = "quote_id",
    value_col: str = "value",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to every point row the most
    recent quote row with the same keys and quote-time <= point-time —
    the feature-store primitive that prevents training-serving skew
    (each training example must see exactly the feature values that
    existed at its own event time, never later ones). Returns
    (point_id, keys..., ts, asof_quote_id, asof_value); points with no
    prior quote keep NULLs (left semantics).

    NOT implemented as a range join: the classic formulation
    (quote.ts = max over quotes <= point.ts) needs an inequality join
    that Spark lowers to a nested loop. Instead both sides UNION into
    one stream tagged quote=0 / point=1 and a single window
    PARTITIONED by key, ordered by (time, tag, id), carries the last
    non-null quote forward (``last(..., ignorenulls=True)``) — one
    uniform-key shuffle + per-key sort, the same cost as any grouped
    window, at any scale. A quote at exactly the point's timestamp IS
    visible (tag orders quotes first), matching ASOF JOIN ``>=``
    semantics; equal-time quotes resolve to the highest quote id —
    total order, engine-portable.
    """

    pid, qid = F.col(point_id_col), F.col(quote_id_col)
    pt = points.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__t"),
        pid.alias("__pid"),
        F.lit(None).cast("long").alias("__qid"),
        F.lit(None).cast("double").alias("__qv"),
        F.lit(1).alias("__tag"),
    )
    qt = quotes.select(
        *[F.col(c) for c in on],
        F.col(quote_ts_col).alias("__t"),
        F.lit(None).cast("long").alias("__pid"),
        qid.cast("long").alias("__qid"),
        F.col(value_col).cast("double").alias("__qv"),
        F.lit(0).alias("__tag"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            _epoch_us("__t"),
            F.col("__tag"),
            F.coalesce(F.col("__qid"), F.col("__pid")),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = pt.unionByName(qt).select(
        *on,
        "__t",
        "__pid",
        "__tag",
        F.last("__qid", ignorenulls=True).over(w).alias("asof_quote_id"),
        F.last("__qv", ignorenulls=True).over(w).alias("asof_value"),
    )
    return merged.filter(F.col("__tag") == 1).select(
        F.col("__pid").alias(point_id_col),
        *on,
        F.col("__t").alias(ts_col),
        "asof_quote_id",
        "asof_value",
    )
