"""Streaming joins: the stream-stream interval (time-range) join.

The batch ``operators/timeseries.py::interval_join`` buckets the time
axis so the range predicate runs as an equi-join. In Structured
Streaming, Spark's native stream-stream join already maintains keyed
range state in the state store — what it needs from the caller is
(a) watermarks on BOTH event-time columns and (b) a time-range bound
between them, or state grows forever. ``stream_interval_join``
assembles exactly that contract.

State size: each side keeps only rows younger than
watermark + ``max_duration`` — the same bounded-eviction shape the
window operators get from their watermark, applied to a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    max_duration: str = "1 hour",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming point-in-interval join: each point row (event time
    ``ts_col``) matches interval rows with the same ``on`` keys whose
    [start, end] contains it — inclusive ends, same semantics as the
    batch ``interval_join``, gated equal to it in test_streaming.py.

    ``max_duration`` must bound every interval's length (end - start);
    it is what lets Spark evict interval state once the point-side
    watermark passes ``start + max_duration``, and point state once
    the interval-side watermark passes ``ts``. Intervals longer than
    ``max_duration`` lose matches past the bound — the operator trades
    that explicit contract for bounded state, exactly like a watermark
    drops too-late rows.
    """

    pt = points.alias("p").withWatermark(ts_col, watermark)
    iv = intervals.alias("i").withWatermark(start_col, watermark)
    cond = " AND ".join(
        [f"p.{k} = i.{k}" for k in on]
        + [
            f"p.{ts_col} >= i.{start_col}",
            f"p.{ts_col} <= i.{end_col}",
            f"p.{ts_col} <= i.{start_col} + INTERVAL {max_duration}",
        ]
    )
    joined = pt.join(iv, on=F.expr(cond))
    # The equi-keys appear on both sides; keep the point side's copy.
    return joined.drop(*[iv[k] for k in on])
