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
