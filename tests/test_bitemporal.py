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


# ---------------------------------------------------------------------------
# Property gate: as_of vs DuckDB (random bitemporal fact tables)
# ---------------------------------------------------------------------------

import os as _os

import duckdb as _duckdb
from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

# unique (e, ev_t, sys_t) keys => no ordering ties, deterministic both
# engines; retracted corrections delete facts when they win.
_bt_facts = _st.dictionaries(
    _st.tuples(
        _st.integers(0, 3), _st.integers(0, 5), _st.integers(0, 9)
    ),
    _st.tuples(_st.integers(0, 99), _st.booleans()),
    min_size=1,
    max_size=25,
)


@_settings(
    max_examples=int(_os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "50")) // 2,
    deadline=None,
    suppress_health_check=[_HealthCheck.too_slow],
)
@_given(facts=_bt_facts, t=_st.integers(0, 10))
def test_prop_as_of_matches_duckdb(spark, facts, t):
    """For random bitemporal fact tables and a random as-of system
    time, the engine's as_of (latest sys_t <= T correction per
    (entity, event time), retraction-aware) equals DuckDB computing
    the same window select."""

    from declarative_dataflow_spark.operators.bitemporal import as_of

    rows_in = [
        (e, ev, sy, v, r) for (e, ev, sy), (v, r) in sorted(facts.items())
    ]
    df = spark.createDataFrame(
        rows_in, "e long, ev_t long, sys_t long, v long, retracted boolean"
    )
    got = sorted(
        tuple(r) for r in as_of(df, t, ["e"]).collect()
    )

    con = _duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE facts (e BIGINT, ev_t BIGINT, sys_t BIGINT, "
            "v BIGINT, retracted BOOLEAN)"
        )
        con.executemany("INSERT INTO facts VALUES (?, ?, ?, ?, ?)", rows_in)
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT e, ev_t, sys_t, v, retracted FROM ("
                "  SELECT *, row_number() OVER ("
                "    PARTITION BY e, ev_t ORDER BY sys_t DESC) AS rn"
                f"  FROM facts WHERE sys_t <= {t})"
                " WHERE rn = 1 AND NOT coalesce(retracted, false)"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


@_settings(
    max_examples=int(_os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "50")) // 2,
    deadline=None,
    suppress_health_check=[_HealthCheck.too_slow],
)
@_given(
    ivs=_st.lists(
        _st.tuples(
            _st.integers(0, 2),    # key
            _st.integers(0, 30),   # start
            _st.integers(0, 12),   # length
        ),
        min_size=1,
        max_size=20,
    )
)
def test_prop_period_coalesce_matches_bruteforce(spark, ivs):
    """PROPERTY: period_coalesce == the textbook sweep merge
    (overlapping-or-touching intervals fold; strictly-later starts
    open a new period) on random per-key interval sets."""

    from declarative_dataflow_spark.operators import bitemporal as B

    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        tuple(r)
        for r in B.period_coalesce(df).select(
            "k", "period_seq", "s", "e", "n_intervals"
        ).collect()
    )

    want = []
    by_key: dict = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, items in by_key.items():
        items.sort()
        seq = 0
        cur_s = cur_e = None
        n = 0
        for s, e in items:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    want.append((k, seq, cur_s, cur_e, n))
                seq += 1
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        want.append((k, seq, cur_s, cur_e, n))
    assert got == sorted(want)
