"""Introspection sources: the engine's own execution events as
queryable attributes.

Parity with the reference's TimelyLogging / DifferentialLogging
sources (src/sources/timely_logging.rs:21-34,
src/sources/differential_logging.rs:22-32), which re-enter timely's
log streams as attributes so users can query the engine with the
engine. Spark-first: the corresponding event streams are

- batch execution: job/stage metrics from the SparkContext status
  tracker, polled like the reference's polling sources (csv_file.rs
  re-polls on an interval);
- streaming execution: StreamingQueryListener progress events,
  pushed as they arrive.

Both transact ordinary datoms into an Engine, so `[?job
spark/job-status ?s]` composes with any other query.
"""

from __future__ import annotations

from typing import Any

from ..engine import Datom, Engine

JOB_ATTRIBUTES = ["spark/job-status", "spark/job-num-stages"]
STAGE_ATTRIBUTES = [
    "spark/stage-num-tasks",
    "spark/stage-num-completed-tasks",
    "spark/stage-num-failed-tasks",
]
STREAMING_ATTRIBUTES = [
    "spark/batch-input-rows",
    "spark/batch-duration-ms",
]


class SparkLoggingSource:
    """Poll job/stage execution metrics into engine attributes.

    Each ``poll()`` transacts the CURRENT state, retracting stale
    values via LastWriteWins input semantics — callers should create
    the attributes with ``register(engine)`` which applies it.
    """

    def __init__(self, engine: Engine):
        self.engine = engine
        from ..engine import AttributeConfig, InputSemantics

        lww = AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
        for aid in JOB_ATTRIBUTES + STAGE_ATTRIBUTES:
            engine.create_attribute(aid, lww)

    def poll(self) -> int:
        """Harvest all retained jobs/stages; returns datoms transacted."""

        tracker = self.engine.spark.sparkContext.statusTracker()
        datoms: list[Datom] = []
        stage_ids: set[int] = set()
        # The tracker retains a bounded window of jobs
        # (spark.ui.retainedJobs); ask it which ids it still knows
        # rather than enumerating from 0 — in a long-lived session job
        # 0 is evicted and a sequential scan would see nothing.
        jids = set(tracker.getActiveJobsIds())
        jids.update(tracker.getJobIdsForGroup(None))
        for jid in sorted(jids):
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            datoms.append(Datom.add(jid, "spark/job-status", info.status))
            datoms.append(
                Datom.add(jid, "spark/job-num-stages", len(info.stageIds))
            )
            stage_ids.update(info.stageIds)
        for sid in sorted(stage_ids):
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            datoms.append(Datom.add(sid, "spark/stage-num-tasks", sinfo.numTasks))
            datoms.append(
                Datom.add(
                    sid,
                    "spark/stage-num-completed-tasks",
                    sinfo.numCompletedTasks,
                )
            )
            datoms.append(
                Datom.add(
                    sid, "spark/stage-num-failed-tasks", sinfo.numFailedTasks
                )
            )
        if datoms:
            self.engine.transact(datoms)
        return len(datoms)


def attach_streaming_logging(engine: Engine) -> Any:
    """Attach a StreamingQueryListener that transacts per-batch
    progress as attributes (push path; the reference's log streams are
    push too). Returns the listener (detach with
    ``spark.streams.removeListener``)."""

    from pyspark.sql.streaming import StreamingQueryListener

    for aid in STREAMING_ATTRIBUTES:
        if aid not in engine._transacted:
            engine.create_attribute(aid)

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            engine.transact(
                [
                    Datom.add(
                        p.batchId, "spark/batch-input-rows", p.numInputRows
                    ),
                    Datom.add(
                        p.batchId,
                        "spark/batch-duration-ms",
                        p.durationMs.get("triggerExecution", 0),
                    ),
                ]
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Listener()
    engine.spark.streams.addListener(listener)
    return listener


DECLARATIVE_ATTRIBUTES = [
    "3df/event-kind",
    "3df/event-subject",
    "3df/event-count",
]

# Meta-event entities live in a RESERVED id range so they can never
# collide with user entity ids: a query joining a user attribute and
# 3df/event-kind on ?e must only unify when the user genuinely
# transacted onto a meta entity, not because the log counter happened
# to reuse eid 0..n. 2^62 leaves the whole positive int64 range below
# it to users while staying a plain BIGINT in every engine.
META_EID_BASE = 1 << 62


def _seed_meta_eid(engine: Engine) -> int:
    """First free meta-event eid: the engine-level high-water mark if
    one exists (survives detach()/re-attach in-process), raised past
    any 3df/event-kind entities already in the attribute's history
    (covers an engine whose meta datoms were restored/transacted
    externally). Spilled history is scanned with one tiny max()
    aggregation only when a spill tier exists."""

    nxt = getattr(engine, "_meta_next_eid", META_EID_BASE)
    ta = engine._transacted.get("3df/event-kind")
    if ta is not None:
        for r in ta.rows:
            if r[0] >= META_EID_BASE:
                nxt = max(nxt, r[0] + 1)
        if ta._spill_dir is not None:
            from pyspark.sql import functions as F

            row = (
                ta.dataframe()
                .filter(F.col("e") >= META_EID_BASE)
                .agg(F.max("e").alias("m"))
                .first()
            )
            if row is not None and row["m"] is not None:
                nxt = max(nxt, row["m"] + 1)
    return nxt


def attach_declarative_logging(engine: Engine):
    """The third logging source: the ENGINE'S OWN events as queryable
    attributes — parity with the reference's DeclarativeLogging
    (src/sources/declarative_logging.rs re-enters 3DF's own log stream
    the way timely_logging/differential_logging re-enter the layers
    below). Where the reference taps its dataflow logger, this wraps
    the Engine's public mutation surface: every attribute creation,
    query registration, and user transaction transacts one meta-event
    entity carrying (3df/event-kind, 3df/event-subject,
    3df/event-count) — so `[?e 3df/event-kind "transact"]` composes
    with any other query and an operator can watch the engine with the
    engine.

    Meta-transactions do NOT log themselves (a re-entrancy flag guards
    the wrapper — the reference's logger has the same property: log
    events are not re-logged). Meta-event entity ids are allocated
    from the reserved range starting at :data:`META_EID_BASE` and the
    counter is seeded past any existing meta events on attach, so
    (a) meta entities can never collide with user entity ids and
    (b) detach()/re-attach never reuses an earlier meta eid (which
    would stack duplicate event-kind datoms on one entity). Returns a
    ``detach()`` callable that restores the unwrapped methods."""

    for aid in DECLARATIVE_ATTRIBUTES:
        if aid not in engine._transacted:
            engine.create_attribute(aid)

    state = {"next_id": _seed_meta_eid(engine), "in_log": False}
    orig_transact = engine.transact
    orig_create = engine.create_attribute
    orig_register = engine.register

    def _log(kind: str, subject: str, count: int) -> None:
        if state["in_log"]:
            return
        state["in_log"] = True
        try:
            eid = state["next_id"]
            state["next_id"] += 1
            # engine-level high-water mark: survives detach()/attach
            engine._meta_next_eid = state["next_id"]
            orig_transact(
                [
                    Datom.add(eid, "3df/event-kind", kind),
                    Datom.add(eid, "3df/event-subject", subject),
                    Datom.add(eid, "3df/event-count", count),
                ]
            )
        finally:
            state["in_log"] = False

    def transact(datoms):
        ds = list(datoms)
        out = orig_transact(ds)
        _log("transact", "", len(ds))
        return out

    def create_attribute(name, *args, **kwargs):
        out = orig_create(name, *args, **kwargs)
        _log("attribute-created", name, 1)
        return out

    def register(name, plan):
        out = orig_register(name, plan)
        _log("query-registered", name, 1)
        return out

    engine.transact = transact
    engine.create_attribute = create_attribute
    engine.register = register

    def detach() -> None:
        engine.transact = orig_transact
        engine.create_attribute = orig_create
        engine.register = orig_register

    return detach
