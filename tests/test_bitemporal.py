"""Bitemporal corrections/as-of semantics
(ports reference tests/input_semantics.rs:337-510 shapes)."""

from declarative_dataflow_spark.operators.bitemporal import (
    as_of,
    history_at_each_correction,
)


def _facts(spark):
    # (e, ev_t, sys_t, v[, retracted]) — corrections arrive at later
    # sys_t for the same (e, ev_t).
    return spark.createDataFrame(
        [
            (1, 100, 10, "a", False),
            (1, 100, 20, "b", False),   # correction: a -> b
            (2, 100, 10, "x", False),
            (2, 100, 30, None, True),   # retraction at sys 30
            (1, 200, 15, "c", False),
        ],
        ["e", "ev_t", "sys_t", "v", "retracted"],
    )


def test_as_of_before_correction(spark):
    out = {
        (r["e"], r["ev_t"]): r["v"]
        for r in as_of(_facts(spark), 15, ["e"]).collect()
    }
    assert out[(1, 100)] == "a"  # correction at sys 20 not yet visible
    assert out[(2, 100)] == "x"
    assert out[(1, 200)] == "c"


def test_as_of_after_correction_and_retraction(spark):
    out = {
        (r["e"], r["ev_t"]): r["v"]
        for r in as_of(_facts(spark), 30, ["e"]).collect()
    }
    assert out[(1, 100)] == "b"  # corrected value wins
    assert (2, 100) not in out  # retracted
    assert out[(1, 200)] == "c"


def test_superseded_flag(spark):
    out = {
        (r["e"], r["ev_t"], r["sys_t"]): r["superseded"]
        for r in history_at_each_correction(_facts(spark), ["e"]).collect()
    }
    assert out[(1, 100, 10)] is True
    assert out[(1, 100, 20)] is False
    assert out[(1, 200, 15)] is False


def test_lww_timeline_toggle(spark):
    """The reference's bitemporal LWW case verbatim
    (tests/input_semantics.rs:440-510): flow 30.006 -> 31.006 ->
    30.006; each event-time boundary retracts the old value and
    asserts the new, including the return to the original value."""

    from declarative_dataflow_spark.operators.bitemporal import lww_timeline

    uuid = "71828aae-4fc8-421b-82ca-68c5f4981d74"
    facts = spark.createDataFrame(
        [
            (uuid, 30.006, 1_554_120_030_000),
            (uuid, 31.006, 1_554_120_061_000),
            (uuid, 30.006, 1_554_120_150_000),
        ],
        ["e", "v", "ev_t"],
    )
    got = {
        (r["v"], r["ev_t"], r["diff"])
        for r in lww_timeline(facts, ["e"]).collect()
    }
    assert got == {
        (30.006, 1_554_120_030_000, 1),
        (30.006, 1_554_120_061_000, -1),
        (31.006, 1_554_120_061_000, 1),
        (31.006, 1_554_120_150_000, -1),
        (30.006, 1_554_120_150_000, 1),
    }


def test_lww_timeline_after_correction(spark):
    """Compose as_of + lww_timeline: a later-system-time correction
    rewrites the event-time history the timeline sees."""

    from declarative_dataflow_spark.operators.bitemporal import (
        as_of,
        lww_timeline,
    )

    facts = spark.createDataFrame(
        [
            (1, 10.0, 100, 0),   # (e, v, ev_t, sys_t)
            (1, 20.0, 200, 0),
            (1, 15.0, 200, 5),   # correction of ev_t=200 at sys 5
        ],
        ["e", "v", "ev_t", "sys_t"],
    )
    before = {
        (r["v"], r["ev_t"], r["diff"])
        for r in lww_timeline(as_of(facts, 0, ["e"]), ["e"]).collect()
    }
    assert before == {(10.0, 100, 1), (10.0, 200, -1), (20.0, 200, 1)}
    after = {
        (r["v"], r["ev_t"], r["diff"])
        for r in lww_timeline(as_of(facts, 5, ["e"]), ["e"]).collect()
    }
    assert after == {(10.0, 100, 1), (10.0, 200, -1), (15.0, 200, 1)}
