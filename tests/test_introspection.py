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


def test_declarative_logging_queryable_and_detaches(engine):
    """The engine's OWN events (attribute creation, registration,
    transactions) become queryable attributes; meta-events never log
    themselves; detach() restores the unwrapped surface."""

    from declarative_dataflow_spark.engine import Datom
    from declarative_dataflow_spark.sources.introspection import (
        attach_declarative_logging,
    )

    detach = attach_declarative_logging(engine)
    try:
        engine.create_attribute("probe/attr")
        engine.transact([Datom.add(1, "probe/attr", 10),
                         Datom.add(2, "probe/attr", 20)])
        kinds = engine.implement(
            MatchA("?e", "3df/event-kind", "?k")
        ).collect()
        by_kind = {}
        for e, k in [(r[0], r[1]) for r in kinds]:
            by_kind.setdefault(k, []).append(e)
        assert "attribute-created" in by_kind
        assert "transact" in by_kind
        counts = {
            r[0]: r[1]
            for r in engine.implement(
                MatchA("?e", "3df/event-count", "?n")
            ).collect()
        }
        # the user transaction logged exactly its own datom count —
        # and the meta-transaction did NOT log itself
        tr = by_kind["transact"]
        assert len(tr) == 1 and counts[tr[0]] == 2
        n_events_before = len(kinds)
    finally:
        detach()
    engine.transact([Datom.add(3, "probe/attr", 30)])
    kinds_after = engine.implement(
        MatchA("?e", "3df/event-kind", "?k")
    ).collect()
    assert len(kinds_after) == n_events_before, "detach did not restore"


def test_declarative_logging_meta_eids_reserved_and_never_reused(engine):
    """Meta-event entities live in the reserved range (>= 2^62, never
    colliding with user entity ids) and a detach()/re-attach cycle
    continues PAST earlier meta eids instead of resetting to the base
    (a reset would stack duplicate event-kind datoms on one entity)."""

    from declarative_dataflow_spark.engine import Datom
    from declarative_dataflow_spark.sources.introspection import (
        META_EID_BASE,
        attach_declarative_logging,
    )

    detach = attach_declarative_logging(engine)
    try:
        engine.create_attribute("probe/attr")
        # a user datom on eid 0 — the old counter's first meta eid
        engine.transact([Datom.add(0, "probe/attr", 1)])
        rows = engine.implement(
            MatchA("?e", "3df/event-kind", "?k")
        ).collect()
        eids_first = {r[0] for r in rows}
        assert eids_first, "no meta events logged"
        assert all(e >= META_EID_BASE for e in eids_first), (
            "meta eids must sit in the reserved range, "
            f"got {sorted(eids_first)[:3]}"
        )
        # joining user attrs and meta attrs on ?e must NOT unify:
        # eid 0 carries probe/attr but no event-kind
        assert 0 not in eids_first
    finally:
        detach()
    detach2 = attach_declarative_logging(engine)
    try:
        engine.transact([Datom.add(5, "probe/attr", 2)])
        rows2 = engine.implement(
            MatchA("?e", "3df/event-kind", "?k")
        ).collect()
        new_eids = {r[0] for r in rows2} - eids_first
        assert new_eids, "re-attached logger logged nothing"
        assert min(new_eids) > max(eids_first), (
            "re-attach reused earlier meta eids"
        )
    finally:
        detach2()
