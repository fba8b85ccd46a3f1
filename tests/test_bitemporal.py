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
