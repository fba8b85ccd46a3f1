"""Input semantics: Raw / Distinct / LastWriteWins, incl. out-of-order
late arrival (ports reference tests/input_semantics.rs)."""

from declarative_dataflow_spark import (
    AttributeConfig,
    Datom,
    InputSemantics,
    MatchA,
)

from conftest import rows


def test_distinct_ingest(engine):
    engine.create_attribute(
        "tag", AttributeConfig(input_semantics=InputSemantics.DISTINCT)
    )
    engine.transact(
        [
            Datom.add(1, "tag", "x"),
            Datom.add(1, "tag", "x"),
            Datom.add(1, "tag", "y"),
        ]
    )
    df = engine.implement(MatchA("?e", "tag", "?v"), ["e", "v"])
    assert rows(df) == [(1, "x", 1), (1, "y", 1)]


def test_lww_basic(engine):
    engine.create_attribute(
        "val", AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
    )
    engine.transact([Datom.add(1, "val", "a")])
    engine.transact([Datom.add(1, "val", "b")])
    df = engine.implement(MatchA("?e", "val", "?v"), ["e", "v"])
    assert rows(df) == [(1, "b", 1)]


def test_lww_late_arrival(engine):
    """A write with an older explicit time does NOT displace the newer
    value (reference: tests/input_semantics.rs:272-297)."""

    engine.create_attribute(
        "val", AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
    )
    engine.transact([Datom.add(1, "val", "new", t=10)])
    engine.transact([Datom.add(1, "val", "late", t=5)])  # late arrival
    df = engine.implement(MatchA("?e", "val", "?v"), ["e", "v"])
    assert rows(df) == [(1, "new", 1)]


def test_lww_per_entity(engine):
    engine.create_attribute(
        "val", AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
    )
    engine.transact(
        [
            Datom.add(1, "val", "a"),
            Datom.add(2, "val", "x"),
        ]
    )
    engine.transact([Datom.add(1, "val", "b")])
    df = engine.implement(MatchA("?e", "val", "?v"), ["e", "v"])
    assert rows(df) == [(1, "b", 1), (2, "x", 1)]


def test_lww_equal_time_ties_deterministic(engine):
    """Equal-t writes resolve by arrival order (the data-carried __seq),
    not partition layout: the LAST transacted write wins, every run."""

    engine.create_attribute(
        "tv", AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
    )
    # Same entity, same explicit time, three competing values in one
    # transaction plus one more in a later transaction at the same t.
    engine.transact(
        [
            Datom.add(1, "tv", "first", 100),
            Datom.add(1, "tv", "second", 100),
            Datom.add(1, "tv", "third", 100),
        ]
    )
    engine.transact([Datom.add(1, "tv", "fourth", 100)])
    df = engine.implement(MatchA("?e", "tv", "?v"), ["e", "v"])
    assert rows(df) == [(1, "fourth", 1)]


def test_lww_table_ties_deterministic(engine):
    """Table-backed LWW: static tables carry no arrival order, so equal
    event times resolve by the larger value (same rule as streaming)."""

    df = engine.spark.createDataFrame(
        [
            (1, 10, 100),
            (1, 30, 100),  # tie on ts=100 -> larger value wins
            (1, 20, 100),
            (2, 5, 50),
            (2, 7, 40),  # older ts loses regardless of value
        ],
        ["user_id", "value", "ts"],
    )
    engine.register_table("ties", df)
    engine.register_table_attribute(
        "u/last", "ties", "user_id", "value", "ts",
        InputSemantics.LAST_WRITE_WINS,
    )
    out = engine.implement(MatchA("?u", "u/last", "?v"), ["u", "v"])
    assert rows(out) == [(1, 30), (2, 5)]


def test_cas_reference_sequence(engine):
    """Ported from the reference's commented-out compare_and_swap test
    (tests/input_semantics.rs:299-333): expect-absent sets, stale
    expectations fail, matching expectation swaps, and a matching
    delete empties the register."""

    engine.create_attribute(
        "reg", AttributeConfig(input_semantics=InputSemantics.COMPARE_AND_SWAP)
    )
    engine.transact(
        [
            Datom.cas(100, "reg", None, 1, t=1),   # absent -> 1
            Datom.cas(100, "reg", None, 1, t=2),   # fails (present)
            Datom.cas(100, "reg", None, 8, t=3),   # fails (present)
            Datom.cas(100, "reg", 1, 2, t=4),      # 1 -> 2
            Datom.cas(100, "reg", 1, 3, t=5),      # fails (cur=2)
        ]
    )
    df = engine.implement(MatchA("?e", "reg", "?v"), ["e", "v"])
    assert rows(df) == [(100, 2, 1)]
    engine.transact([Datom.cas(100, "reg", 2, None, t=6)])  # delete
    df = engine.implement(MatchA("?e", "reg", "?v"), ["e", "v"])
    assert rows(df) == []


def test_cas_per_entity_and_order(engine):
    """Ops fold per entity in (t, seq) order; out-of-order transact
    batches still fold by event time."""

    engine.create_attribute(
        "reg2", AttributeConfig(input_semantics=InputSemantics.COMPARE_AND_SWAP)
    )
    # Second entity unaffected by the first's history; t=5 arrives
    # before t=4 but folds after it.
    engine.transact([Datom.cas(1, "reg2", None, 10, t=1)])
    engine.transact([Datom.cas(1, "reg2", 11, 12, t=5)])
    engine.transact([Datom.cas(1, "reg2", 10, 11, t=4)])
    engine.transact([Datom.cas(2, "reg2", None, 7, t=2)])
    df = engine.implement(MatchA("?e", "reg2", "?v"), ["e", "v"])
    # Event-time fold: t=4 applies (10->11), THEN t=5 applies (11->12).
    assert rows(df) == [(1, 12, 1), (2, 7, 1)]


def test_cas_compaction_preserves_register(engine):
    """advance_traces folds CAS history into one expect-absent op; the
    register answers identically and newer ops still apply."""

    engine.create_attribute(
        "reg3",
        AttributeConfig(
            input_semantics=InputSemantics.COMPARE_AND_SWAP, trace_slack=1
        ),
    )
    engine.transact(
        [
            Datom.cas(1, "reg3", None, 5, t=1),
            Datom.cas(1, "reg3", 5, 6, t=2),
            Datom.cas(2, "reg3", None, 1, t=2),
            Datom.cas(2, "reg3", 1, None, t=3),  # deleted register
        ]
    )
    ta = engine._transacted["reg3"]
    dropped = ta.compact(cutoff=10)
    assert dropped > 0
    df = engine.implement(MatchA("?e", "reg3", "?v"), ["e", "v"])
    assert rows(df) == [(1, 6, 1)]
    # A newer op against the compacted state still applies.
    engine.transact([Datom.cas(1, "reg3", 6, 7, t=11)])
    df = engine.implement(MatchA("?e", "reg3", "?v"), ["e", "v"])
    assert rows(df) == [(1, 7, 1)]
