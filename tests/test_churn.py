"""The deterministic churn script (streaming/churn.py) that exposes
the maintained twins to the driver's oracle gate: the Spark-side
retire predicate and the generated DuckDB WHERE clause must agree row
for row, and driving a maintainer through the script must land on the
batch operator over the surviving rows (the closed form the declared
oracles state)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from declarative_dataflow_spark.streaming.churn import (
    CHURN_EPOCHS,
    RETRACT_MOD,
    run_churn,
    surviving,
    surviving_sql,
)

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_predicate_sql_lockstep(spark):
    """surviving() and surviving_sql() are the same set: evaluate both
    over an exhaustive (event_id, user_id) residue grid."""

    grid = spark.range(0, CHURN_EPOCHS * RETRACT_MOD * 4).select(
        (F.col("id") % (CHURN_EPOCHS * 4)).alias("event_id"),
        (F.col("id") % (RETRACT_MOD * 3)).alias("user_id"),
    )
    got = rows(surviving(grid))
    con = duckdb.connect()
    n = CHURN_EPOCHS * RETRACT_MOD * 4
    want = sorted(
        con.execute(
            f"SELECT i % {CHURN_EPOCHS * 4} AS event_id, "
            f"i % {RETRACT_MOD * 3} AS user_id "
            f"FROM range({n}) t(i) WHERE " + surviving_sql()
        ).fetchall()
    )
    assert got == want


def test_retired_rows_were_added_first(spark):
    """Script sanity: every retracted row's add epoch strictly
    precedes its retract epoch (retractions never target facts the
    maintainer has not seen — the oracle's closed form depends on
    it)."""

    for i in range(1, CHURN_EPOCHS):
        add_epoch = i - 1
        assert add_epoch < i


def test_churn_equals_batch_sessionize(spark):
    """run_churn(IncrementalSessionize) over the events table ==
    batch session_stats over surviving(events) — the exact equality
    the declared incremental_sessionize_churn oracle asserts, here as
    a DataFrame-level gate independent of DuckDB."""

    from declarative_dataflow_spark.operators.timeseries import (
        session_stats,
    )
    from declarative_dataflow_spark.streaming.event_stats import (
        IncrementalSessionize,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = run_churn(lambda d: IncrementalSessionize(spark, d), ev)
    want = session_stats(surviving(ev), gap_seconds=1800)
    assert rows(got) == rows(want)


def test_churn_equals_batch_asof(spark):
    """run_churn(IncrementalAsOf) over the correction stream == batch
    as_of over the surviving corrections, tombstones included."""

    from declarative_dataflow_spark.operators.bitemporal import as_of
    from declarative_dataflow_spark.operators.timeseries import _epoch_us
    from declarative_dataflow_spark.streaming.event_stats import (
        IncrementalAsOf,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    facts = ev.select(
        "event_id",
        "user_id",
        _epoch_us("ts").alias("__us"),
        F.col("event_id").alias("sys_t"),
        F.col("value").alias("v"),
        (F.col("event_id") % 31 == 0).alias("retracted"),
    ).withColumn("ev_t", F.expr("__us DIV 86400000000")).drop("__us")
    got = run_churn(
        lambda d: IncrementalAsOf(spark, d, e_col="user_id"), facts
    )
    want = as_of(
        surviving(facts), 1 << 62, ["user_id"]
    ).select("user_id", "ev_t", "sys_t", "v")
    assert rows(got) == rows(want)
