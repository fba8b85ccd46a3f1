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
