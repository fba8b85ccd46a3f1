"""Introspection sources: querying the engine with the engine
(reference: src/sources/timely_logging.rs, differential_logging.rs)."""

import time

from declarative_dataflow_spark.plan.plans import MatchA
from declarative_dataflow_spark.sources.introspection import (
    SparkLoggingSource,
    attach_streaming_logging,
)


def test_job_metrics_queryable(engine):
    src = SparkLoggingSource(engine)
    # Run any job, then poll the tracker.
    engine.spark.range(1000).selectExpr("sum(id)").collect()
    assert src.poll() > 0
    rows = engine.implement(MatchA("?job", "spark/job-status", "?s")).collect()
    assert rows and all(r[1] in ("SUCCEEDED", "RUNNING", "FAILED", "UNKNOWN") for r in rows)
    stages = engine.implement(
        MatchA("?s", "spark/stage-num-tasks", "?n")
    ).collect()
    assert stages and all(r[1] >= 1 for r in stages)
    # Polling again refreshes under LWW without duplicating entities.
    jobs_before = {r[0] for r in rows}
    src.poll()
    rows2 = engine.implement(MatchA("?job", "spark/job-status", "?s")).collect()
    assert {r[0] for r in rows2} >= jobs_before
    assert len({r[0] for r in rows2}) == len(rows2)


def test_streaming_progress_queryable(engine, tmp_path):
    listener = attach_streaming_logging(engine)
    spark = engine.spark
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        q = (
            df.writeStream.format("memory")
            .queryName("introspection_probe")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 30
            rows = []
            while time.time() < deadline:
                rows = engine.implement(
                    MatchA("?b", "spark/batch-input-rows", "?n")
                ).collect()
                if rows:
                    break
                time.sleep(0.5)
            assert rows, "no streaming progress events captured"
        finally:
            q.stop()
    finally:
        spark.streams.removeListener(listener)
