"""Bitemporal (system x event time) support.

The reference backs its ``Time::Bi`` timestamps with a product-order
Pair (src/timestamp/pair.rs:14-34) and tests corrections/toggles over
(system, event) time (tests/input_semantics.rs:337-510). Spark-first,
bitemporality is modeled AS DATA: two timestamp columns; a correction
is a new row with a later system time for the same (entity, event
time); as-of queries pick the latest correction visible at a given
system time.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def as_of(
    facts: DataFrame,
    sys_time: Any,
    e_cols: list[str],
    ev_col: str = "ev_t",
    sys_col: str = "sys_t",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """The state of every (entity, event-time) fact as known at
    ``sys_time``: latest system-time correction with sys_t <= sys_time.

    Rows with a ``retracted`` boolean column set on the winning
    correction are dropped (a correction can delete a fact).
    """

    order = [F.col(sys_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*e_cols, ev_col).orderBy(*order)
    visible = facts.filter(F.col(sys_col) <= F.lit(sys_time))
    latest = visible.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    if "retracted" in facts.columns:
        latest = latest.filter(~F.coalesce(F.col("retracted"), F.lit(False)))
    return latest


def lww_timeline(
    facts: DataFrame,
    e_cols: list[str],
    v_col: str = "v",
    ev_col: str = "ev_t",
) -> DataFrame:
    """Changelog of the last-write-wins value along EVENT time: at each
    event time where the visible value changes, retract the previous
    value and assert the new one — the diff stream the reference's
    bitemporal LWW tests expect (tests/input_semantics.rs:381-510,
    including a value toggling back to an earlier state).

    Input rows are (e_cols..., v, ev_t) already reduced to one row per
    (entity, event time) — apply :func:`as_of` first for bitemporal
    inputs with corrections. Output: (e_cols..., v, ev_t, diff).
    """

    w = Window.partitionBy(*e_cols).orderBy(F.col(ev_col).asc())
    cur = facts.withColumn("__prev", F.lag(v_col).over(w))
    changed = cur.filter(
        F.col("__prev").isNull() | (F.col(v_col) != F.col("__prev"))
    )
    asserts = changed.select(
        *e_cols, F.col(v_col), F.col(ev_col), F.lit(1).alias("diff")
    )
    retracts = changed.filter(F.col("__prev").isNotNull()).select(
        *e_cols,
        F.col("__prev").alias(v_col),
        F.col(ev_col),
        F.lit(-1).alias("diff"),
    )
    return asserts.unionByName(retracts)


def history_at_each_correction(
    facts: DataFrame,
    e_cols: list[str],
    ev_col: str = "ev_t",
    sys_col: str = "sys_t",
) -> DataFrame:
    """For audit queries: every fact row annotated with whether it was
    ever superseded (a later sys_t exists for the same (e, ev))."""

    w = Window.partitionBy(*e_cols, ev_col)
    return facts.withColumn(
        "superseded", F.col(sys_col) < F.max(sys_col).over(w)
    )


def period_coalesce(
    intervals: DataFrame,
    key_col: str = "k",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Temporal COALESCE / NORMALIZE (the SQL:2011 temporal-table
    primitive): merge a key's overlapping-or-touching validity periods
    into maximal disjoint periods — the pass a bitemporal store runs
    so "valid 1-5" + "valid 3-8" + "valid 8-9" reads back as one fact
    valid 1-9. Returns (k, period_seq, s, e, n_intervals) with
    period_seq numbering a key's merged periods in time order.

    Shape: gaps-and-islands with a RUNNING MAX — order a key's
    intervals by (s, e), a new island starts where s strictly exceeds
    the max end seen so far (touching intervals s == max merge, the
    coalesce convention), island id = running count of starts. ONE
    key-partitioned window pass + one (key, island) aggregation —
    the sessionize discipline: per-key partitions, never a global
    sort. Degenerate/reversed intervals (e < s) are kept as-is and
    merge by the same rule."""

    iv = intervals.select(
        F.col(key_col).alias("k"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    )
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "k",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(
                F.max("e").over(w_prev), F.lit(None)
            ),
            1,
        )
        .otherwise(
            F.when(F.max("e").over(w_prev).isNull(), 1).otherwise(0)
        )
        .alias("nf"),
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "k",
        "s",
        "e",
        F.sum("nf").over(w_run).alias("period_seq"),
    )
    return islands.groupBy("k", "period_seq").agg(
        F.min("s").alias("s"),
        F.max("e").alias("e"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
