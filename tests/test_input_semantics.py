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
