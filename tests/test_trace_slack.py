"""trace_slack-driven state compaction/eviction
(reference: Domain::advance_traces, src/domain/mod.rs:291-341 —
attribute traces advance to frontier - slack, merging older diffs).

Batch: Engine.advance_traces compacts transacted history; queries at
the frontier are unchanged, and writes within the slack still land
exactly. Streaming: stream_last_write_wins evicts per-entity state
once its winner lags the event-time watermark by more than the slack.
"""

import json

from declarative_dataflow_spark import Datom
from declarative_dataflow_spark.engine import (
    AttributeConfig,
    InputSemantics,
)
from declarative_dataflow_spark.plan.plans import MatchA

from conftest import rows


def _lww_attr(engine, slack):
    engine.create_attribute(
        "user/name",
        AttributeConfig(
            input_semantics=InputSemantics.LAST_WRITE_WINS,
            trace_slack=slack,
        ),
    )


def test_advance_traces_compacts_lww(engine):
    _lww_attr(engine, slack=2)
    # Five transactions for the same entities: t advances per transact.
    for i in range(5):
        engine.transact(
            [
                Datom.add(1, "user/name", f"alice{i}"),
                Datom.add(2, "user/name", f"bob{i}"),
            ]
        )
    before = rows(engine.implement(MatchA("?e", "user/name", "?v")))
    stored = engine._transacted["user/name"]
    assert len(stored.rows) == 10
    dropped = engine.advance_traces()
    # frontier=5, slack=2 -> rows at t<=3 fold to one winner per entity.
    assert dropped == {"user/name": 6}
    assert len(stored.rows) == 4  # one winner x2 entities + t=4 rows
    after = rows(engine.implement(MatchA("?e", "user/name", "?v")))
    assert after == before

    # A write within the slack (t between cutoff and frontier) still
    # resolves exactly against the compacted history.
    engine.transact([Datom.add(1, "user/name", "late", t=4)])
    got = dict(
        (e, v)
        for e, v, _ in rows(engine.implement(MatchA("?e", "user/name", "?v")))
    )
    # t=4 ties the stored alice4 (t=4): the later arrival has the
    # larger __seq and wins deterministically.
    assert got[1] == "late" and got[2] == "bob4"


def test_advance_traces_keeps_winning_retraction(engine):
    """A compacted LWW retraction survives, so an evicted-and-resent
    older write cannot resurrect past a recorded delete."""

    _lww_attr(engine, slack=0)
    engine.transact([Datom.add(1, "user/name", "alice")])
    engine.transact([Datom.retract(1, "user/name", "alice")])
    assert rows(engine.implement(MatchA("?e", "user/name", "?v"))) == []
    engine.advance_traces()
    stored = engine._transacted["user/name"]
    assert len(stored.rows) == 1 and stored.rows[0][3] == -1
    # Replay of the pre-delete write (same t as the original) still
    # loses to the retained retraction.
    engine.transact([Datom.add(1, "user/name", "alice", t=0)])
    assert rows(engine.implement(MatchA("?e", "user/name", "?v"))) == []


def test_advance_traces_consolidates_weights(engine):
    """Raw/Distinct compaction folds (e, v) net weights at the cutoff:
    multiplicity survives, so later retractions still cancel."""

    engine.create_attribute(
        "tag/of", AttributeConfig(trace_slack=0)
    )
    engine.transact(
        [
            Datom.add(1, "tag/of", "x"),
            Datom.add(1, "tag/of", "x"),
            Datom.add(2, "tag/of", "y"),
            Datom.retract(2, "tag/of", "y"),
        ]
    )
    dropped = engine.advance_traces()
    assert dropped == {"tag/of": 3}
    stored = engine._transacted["tag/of"]
    assert [(r[0], r[1], r[3]) for r in stored.rows] == [(1, "x", 2)]
    # The folded weight-2 row nets to 1 after a single retraction.
    engine.transact([Datom.retract(1, "tag/of", "x")])
    got = rows(engine.implement(MatchA("?e", "tag/of", "?v")))
    assert got == [(1, "x", 1)]


def test_reactive_session_advances_traces(engine):
    """ReactiveSession compacts slack-configured attributes every epoch
    while subscription diffs stay correct."""

    from declarative_dataflow_spark.streaming.reactive import (
        ReactiveSession,
    )

    _lww_attr(engine, slack=1)
    engine.register("names", MatchA("?e", "user/name", "?v"))
    session = ReactiveSession(engine)
    session.interest("names")
    sub = session.interests["names"]
    for i in range(4):
        session.transact([Datom.add(1, "user/name", f"v{i}")])
    # History is bounded: frontier-1 keeps at most the winner plus the
    # newest epoch's row.
    assert len(engine._transacted["user/name"].rows) <= 2
    # Accumulated diffs still resolve to the latest value only.
    acc: dict = {}
    for _, diffs in sub.history:
        for r in diffs:
            key = (r["?e"], r["?v"])
            acc[key] = acc.get(key, 0) + r["diff"] * r["__epoch_diff"]
    live = {k for k, w in acc.items() if w > 0}
    assert live == {(1, "v3")}


def test_transacted_history_spills_off_driver(engine):
    """Past SPILL_ROWS the driver-held list flushes to parquet; reads
    union the spill scan with the fresh tail, and compaction rewrites
    the spill Spark-side (bounded driver memory for long-lived
    attributes)."""

    from declarative_dataflow_spark.engine import _TransactedAttribute

    orig = _TransactedAttribute.SPILL_ROWS
    _TransactedAttribute.SPILL_ROWS = 100
    try:
        engine.create_attribute(
            "m/v",
            AttributeConfig(
                input_semantics=InputSemantics.LAST_WRITE_WINS,
                trace_slack=1,
            ),
        )
        # 30 entities x 5 epochs = 150 rows -> at least one flush.
        for epoch in range(5):
            engine.transact(
                [
                    Datom.add(e, "m/v", f"v{epoch}_{e}")
                    for e in range(30)
                ]
            )
        ta = engine._transacted["m/v"]
        assert ta._spill_dir is not None  # spilled
        assert len(ta.rows) < 150  # driver list bounded
        got = dict(
            (e, v)
            for e, v, _ in rows(engine.implement(MatchA("?e", "m/v", "?v")))
        )
        assert got == {e: f"v4_{e}" for e in range(30)}
        # Spark-side compaction: frontier=5, slack=1 -> one winner per
        # entity at t<=4 (plus nothing newer), results unchanged.
        dropped = engine.advance_traces()
        assert dropped["m/v"] == 120
        got2 = dict(
            (e, v)
            for e, v, _ in rows(engine.implement(MatchA("?e", "m/v", "?v")))
        )
        assert got2 == got
        # Late-but-within-slack write still lands.
        engine.transact([Datom.add(7, "m/v", "fresh")])
        got3 = dict(
            (e, v)
            for e, v, _ in rows(engine.implement(MatchA("?e", "m/v", "?v")))
        )
        assert got3[7] == "fresh" and got3[8] == "v4_8"
    finally:
        _TransactedAttribute.SPILL_ROWS = orig


def test_stream_lww_trace_slack_evicts(spark, tmp_path):
    """Streaming eviction: an entity whose winner lags the watermark by
    more than the slack is dropped from the state store. Within the
    slack answers are exact; an older-than-slack straggler may
    resurface after eviction (the compaction contract)."""

    from declarative_dataflow_spark.streaming.lww import (
        stream_last_write_wins,
    )

    src = tmp_path / "in"
    src.mkdir()

    def jsonl(name, rows_):
        with open(src / name, "w") as f:
            for r in rows_:
                f.write(json.dumps(r) + "\n")

    # e=1 writes at t=0; e=2 far ahead drives the watermark.
    jsonl("b1.json", [
        {"e": 1, "v": "old", "t": 1_000},
        {"e": 2, "v": "ahead", "t": 600_000},
    ])
    stream = (
        spark.readStream.schema("e long, v string, t long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stream_last_write_wins(stream, trace_slack_ms=10_000)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_slack")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    def state_rows():
        for p in reversed(q.recentProgress):
            ops = p.get("stateOperators") or []
            if ops:
                return ops[0]["numRowsTotal"]
        return None

    try:
        # Batch 0 stores both entities; the follow-up batch advances
        # the watermark to 600s - 10s, so e=1 (timeout at 1s + 10s)
        # evicts while e=2 (timeout 610s) stays.
        q.processAllAvailable()
        assert state_rows() == 1
        removed = sum(
            op["numRowsRemoved"]
            for p in q.recentProgress
            for op in (p.get("stateOperators") or [])
        )
        assert removed == 1
        # Answers within the slack are unaffected by the eviction.
        jsonl("b2.json", [{"e": 3, "v": "tick", "t": 610_000}])
        q.processAllAvailable()
        final = {}
        for r in spark.table("lww_slack").collect():
            final[r["e"]] = r["v"]
        assert final == {1: "old", 2: "ahead", 3: "tick"}
        assert state_rows() == 2  # e=3 joined, e=1 still gone
    finally:
        q.stop()
