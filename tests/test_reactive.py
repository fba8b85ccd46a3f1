"""ReactiveSession: transact -> diffs, the reference's end-to-end
contract (ports the driver loop of tests/query_test.rs:36-113)."""

from declarative_dataflow_spark import Datom, Join, MatchA
from declarative_dataflow_spark.streaming.reactive import ReactiveSession


def _diffs(history, epoch):
    """Net weight change per value tuple: diff x __epoch_diff, so the
    recompute encoding (diff=1, epoch=-1) and the delta-pipeline
    encoding (diff=-1, epoch=1) compare equal — both mean one
    retraction."""

    out = {}
    for e, rows in history:
        if e != epoch:
            continue
        for r in rows:
            t = tuple(r)
            key, net = t[:-2], t[-2] * t[-1]
            out[key] = out.get(key, 0) + net
    return {k: v for k, v in out.items() if v != 0}


def test_reactive_add_then_retract(engine):
    engine.create_attribute("name")
    engine.create_attribute("age")
    engine.register(
        "people",
        Join(["?e"], MatchA("?e", "name", "?n"), MatchA("?e", "age", "?a")),
    )
    session = ReactiveSession(engine)
    session.interest("people")

    session.transact(
        [Datom.add(1, "name", "Dipper"), Datom.add(1, "age", 12)]
    )
    d0 = _diffs(session.interests["people"].history, 0)
    assert d0 == {(1, "Dipper", 12): 1}

    # second entity appears; first is untouched -> no diff for it
    session.transact(
        [Datom.add(2, "name", "Mabel"), Datom.add(2, "age", 13)]
    )
    d1 = _diffs(session.interests["people"].history, 1)
    assert d1 == {(2, "Mabel", 13): 1}

    # retraction produces a -1 diff
    session.transact([Datom.retract(1, "age", 12)])
    d2 = _diffs(session.interests["people"].history, 2)
    assert d2 == {(1, "Dipper", 12): -1}


def test_reactive_uninterest(engine):
    engine.create_attribute("x")
    engine.register("xs", MatchA("?e", "x", "?v"))
    session = ReactiveSession(engine)
    session.interest("xs")
    session.transact([Datom.add(1, "x", 1)])
    session.uninterest("xs")
    assert session.interests == {}
    # transacting after teardown does not fail
    session.transact([Datom.add(2, "x", 2)])


def test_hector_rule_uses_delta_join(engine):
    """Conjunctive rules take the incremental path automatically and
    produce the same accumulated result as the recompute path."""

    from collections import Counter

    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
    )
    from declarative_dataflow_spark.streaming.reactive import ReactiveSession

    for a in ("name", "age"):
        engine.create_attribute(a)
    # Pre-existing data: replayed on subscription.
    engine.transact([Datom.add(1, "name", "Dipper"), Datom.add(1, "age", 12)])

    engine.register(
        "people",
        Hector(
            ["?e", "?n", "?a"],
            [
                AttributeBinding("?e", "name", "?n"),
                AttributeBinding("?e", "age", "?a"),
            ],
        ),
    )
    session = ReactiveSession(engine)
    session.interest("people")
    assert session.interests["people"].delta_join is not None

    session.advance()  # replay epoch
    session.transact([Datom.add(2, "name", "Mabel"), Datom.add(2, "age", 13)])
    session.transact([Datom.retract(1, "age", 12)])

    acc: Counter = Counter()
    for _, rows_ in session.interests["people"].history:
        for r in rows_:
            t = tuple(r)
            acc[t[:-2]] += t[-2] * t[-1]  # diff * __epoch_diff
    acc = +acc
    assert acc == Counter({(2, "Mabel", 13): 1})


def test_interest_granularity_coalesces(engine):
    """granularity=2: diffs batch every second epoch; assert-then-
    retract inside one window cancels entirely (the reference's
    delay+coarsen+consolidate, server/src/main.rs:482-490)."""

    from declarative_dataflow_spark.plan.plans import MatchA
    from declarative_dataflow_spark.streaming.reactive import ReactiveSession

    engine.create_attribute("color")
    engine.register("colors", MatchA("?e", "color", "?v"))
    session = ReactiveSession(engine)
    emitted = []
    session.interest(
        "colors",
        callback=lambda df, epoch: emitted.append((epoch, df.collect())),
        granularity=2,
    )
    session.transact([Datom.add(1, "color", "red")])      # epoch 0: buffered
    assert emitted == []
    session.transact([Datom.add(2, "color", "blue")])     # epoch 1: emit both
    assert len(emitted) == 1
    rows1 = {tuple(r)[:-2] + (r["diff"] * r["__epoch_diff"],) for r in emitted[0][1]}
    assert rows1 == {(1, "red", 1), (2, "blue", 1)}
    # add + retract inside one window -> nothing emitted for entity 3.
    session.transact([Datom.add(3, "color", "teal")])     # epoch 2: buffered
    session.transact([Datom.retract(3, "color", "teal")]) # epoch 3: emit
    rows2 = emitted[1][1]
    assert all(tuple(r)[0] != 3 for r in rows2)


def test_attribute_registered_after_subscription(engine):
    """Subscribing to a rule whose attributes do not exist yet emits
    empty epochs, then picks up data once the attribute is created
    (reference: tests/registration_test.rs)."""

    from declarative_dataflow_spark.plan.plans import MatchA
    from declarative_dataflow_spark.streaming.reactive import ReactiveSession

    engine.register("late", MatchA("?e", "late/attr", "?v"))
    session = ReactiveSession(engine)
    session.interest("late")
    session.advance()  # attribute missing: empty epoch, no error
    assert session.interests["late"].history[0][1] == []

    engine.create_attribute("late/attr")
    session.transact([Datom.add(1, "late/attr", "x")])
    rows_ = session.interests["late"].history[-1][1]
    assert [tuple(r)[:2] for r in rows_] == [(1, "x")]


def test_aggregate_rule_incremental(engine):
    """Aggregate-over-Hector rules take the incremental path: grouped
    SUM updates arrive as retract/assert diffs per changed key."""

    from collections import Counter

    from declarative_dataflow_spark.plan.plans import (
        Aggregate,
        AggregationFn,
        AttributeBinding,
        Hector,
    )
    from declarative_dataflow_spark.streaming.reactive import ReactiveSession

    for a in ("grp", "amt"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "grp", "a"),
            Datom.add(1, "amt", 5),
            Datom.add(2, "grp", "b"),
            Datom.add(2, "amt", 7),
        ]
    )
    engine.register(
        "sums",
        Aggregate(
            ["?g", "?x"],
            Hector(
                ["?g", "?x", "?e"],
                [
                    AttributeBinding("?e", "grp", "?g"),
                    AttributeBinding("?e", "amt", "?x"),
                ],
            ),
            [AggregationFn.SUM],
            ["?g"],
            ["?x"],
            with_variables=["?e"],
        ),
    )
    session = ReactiveSession(engine)
    session.interest("sums")
    assert session.interests["sums"].delta_join is not None

    session.advance()  # replay: current sums
    acc: Counter = Counter()
    for _, rows_ in session.interests["sums"].history:
        for r in rows_:
            t = tuple(r)
            acc[t[:-2]] += t[-2] * t[-1]
    assert +acc == Counter({("a", 5): 1, ("b", 7): 1})

    session.transact([Datom.add(3, "grp", "a"), Datom.add(3, "amt", 10)])
    acc = Counter()
    for _, rows_ in session.interests["sums"].history:
        for r in rows_:
            t = tuple(r)
            acc[t[:-2]] += t[-2] * t[-1]
    assert +acc == Counter({("a", 15): 1, ("b", 7): 1})


def test_late_delta_join_no_double_count(engine):
    """A DeltaJoin seeded during the same advance (attribute appeared
    after subscription, engine.transact already ran) must not replay
    that epoch's datoms on top of its snapshot seed — a later
    retraction would otherwise emit diff=-2."""

    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
    )

    engine.register(
        "xs2", Hector(["?e", "?v"], [AttributeBinding("?e", "x2", "?v")])
    )
    session = ReactiveSession(engine)
    session.interest("xs2")  # attribute does not exist yet
    assert session.interests["xs2"].delta_join is None

    engine.create_attribute("x2")
    session.transact([Datom.add(1, "x2", 1)])  # re-probe seeds DeltaJoin
    assert session.interests["xs2"].delta_join is not None
    d0 = _diffs(session.interests["xs2"].history, 0)
    assert d0 == {(1, 1): 1}

    session.transact([Datom.retract(1, "x2", 1)])
    rows1 = [r for e, rs in session.interests["xs2"].history if e == 1 for r in rs]
    assert [(tuple(r)[:2], r["diff"] * r["__epoch_diff"]) for r in rows1] == [
        ((1, 1), -1)
    ]


def test_reactive_topk_routes_incremental(spark, engine):
    """A TopK-over-Hector rule routes through IncrementalTopK; diffs
    accumulate to the batch result, including runner-up promotion."""

    from collections import Counter

    from declarative_dataflow_spark import Datom
    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
        TopK,
    )
    from declarative_dataflow_spark.streaming.incremental import (
        IncrementalTopK,
    )
    from declarative_dataflow_spark.streaming.reactive import ReactiveSession

    engine.create_attribute("elo")
    engine.register(
        "leaders",
        TopK(
            ["?p", "?r"],
            Hector(["?p", "?r"], [AttributeBinding("?p", "elo", "?r")]),
            [("?r", False), ("?p", True)],
            2,
        ),
    )
    session = ReactiveSession(engine)
    session.interest("leaders")
    assert isinstance(session.interests["leaders"].delta_join, IncrementalTopK)

    session.transact(
        [
            Datom.add(1, "elo", 1500),
            Datom.add(2, "elo", 1800),
            Datom.add(3, "elo", 1600),
        ]
    )
    session.transact([Datom.retract(2, "elo", 1800)])
    acc: Counter = Counter()
    for e, rows in session.interests["leaders"].history:
        for r in rows:
            t = tuple(r)
            acc[t[:-2]] += t[-2] * t[-1]
    acc = +acc
    assert acc == Counter({(3, 1600): 1, (1, 1500): 1})


def test_history_bounded_with_eviction_spill(engine):
    """Driver-side diff history is bounded: a long-lived subscription
    keeps only the newest history_limit epochs; evicted epochs spill
    through on_evict (oldest first) so no diff is lost, and the diffs
    that remain in the window are unchanged."""

    engine.create_attribute("hx")
    engine.register("hxs", MatchA("?e", "hx", "?v"))
    session = ReactiveSession(engine)
    spilled = []
    session.interest(
        "hxs",
        history_limit=3,
        on_evict=lambda e, rows: spilled.append((e, rows)),
    )
    for i in range(8):
        session.transact([Datom.add(i, "hx", i * 10)])
    h = session.interests["hxs"].history
    assert len(h) == 3
    assert [e for e, _ in h] == [5, 6, 7]
    assert [e for e, _ in spilled] == [0, 1, 2, 3, 4]
    # Window + spill together hold every epoch's diffs exactly once.
    d7 = _diffs(h, 7)
    assert d7 == {(7, 70): 1}
    d1 = _diffs(spilled, 1)
    assert d1 == {(1, 10): 1}


def test_diff_sink_history_bounded():
    """DiffSink's no-callback buffer is a bounded deque: 1000 epochs of
    recorded diffs retain only the newest history_limit entries, with
    eviction spilling oldest-first — driver memory stays O(limit), not
    O(epochs)."""

    from declarative_dataflow_spark.streaming.diff_sink import DiffSink

    spilled = []
    sink = DiffSink(history_limit=16, on_evict=lambda e, r: spilled.append(e))
    for epoch in range(1000):
        sink._record(epoch, [("row", epoch, 1)])
    assert len(sink.history) == 16
    assert [e for e, _ in sink.history] == list(range(984, 1000))
    assert spilled == list(range(0, 984))
