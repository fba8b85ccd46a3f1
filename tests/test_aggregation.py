"""Aggregation semantics on transacted datoms
(ports the shape of reference tests/aggregation_test.rs)."""

import pytest

from declarative_dataflow_spark import (
    Aggregate,
    AggregationFn,
    Datom,
    Join,
    MatchA,
    Project,
)

from conftest import rows


def _amounts(engine):
    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "amount", 5),
            Datom.add(2, "amount", 10),
            Datom.add(3, "amount", 10),
            Datom.add(4, "amount", 2),
        ]
    )
    return engine


def test_global_min_max(engine):
    _amounts(engine)
    for fn, expected in [(AggregationFn.MIN, 2), (AggregationFn.MAX, 10)]:
        plan = Aggregate(
            ["?v"],
            Project(["?v"], MatchA("?e", "amount", "?v")),
            [fn],
            [],
            ["?v"],
        )
        assert rows(engine.implement(plan, ["v"])) == [(expected,)]


def test_global_count_sum_avg(engine):
    _amounts(engine)
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.COUNT],
        [],
        ["?v"],
    )
    assert rows(engine.implement(plan, ["n"])) == [(4,)]

    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.SUM],
        [],
        ["?v"],
    )
    assert rows(engine.implement(plan, ["s"])) == [(27,)]

    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.AVG],
        [],
        ["?v"],
    )
    assert rows(engine.implement(plan, ["a"])) == [(27 / 4,)]


def test_sum_with_semantics(engine):
    """:with keeps duplicate contributions
    (reference: tests/aggregation_test.rs:273
    ``[:find (sum ?amount) :with ?e ...]``).

    Without :with, projecting to just ?amount consolidates the two
    (10) contributions from different entities; :with ?e keeps them.
    """

    _amounts(engine)
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.SUM],
        [],
        ["?v"],
        with_variables=[],
    )
    # Bag semantics: projection keeps weight 2 for the duplicate 10s,
    # weighted SUM counts both.
    assert rows(engine.implement(plan, ["s"])) == [(27,)]

    plan = Aggregate(
        ["?e", "?v"],
        MatchA("?e", "amount", "?v"),
        [AggregationFn.SUM],
        [],
        ["?v"],
        with_variables=["?e"],
    )
    assert rows(engine.implement(plan, ["s"])) == [(27,)]


def test_median_upper_middle(engine):
    """Reference picks vals[len/2] — upper-middle, no interpolation
    (aggregate_neu.rs:160-166)."""

    _amounts(engine)  # sorted: 2, 5, 10, 10 -> index 2 -> 10
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.MEDIAN],
        [],
        ["?v"],
    )
    assert rows(engine.implement(plan, ["m"])) == [(10,)]


def test_grouped_aggregate(engine):
    engine.create_attribute("group")
    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "group", "a"),
            Datom.add(2, "group", "a"),
            Datom.add(3, "group", "b"),
            Datom.add(1, "amount", 5),
            Datom.add(2, "amount", 10),
            Datom.add(3, "amount", 2),
        ]
    )
    plan = Aggregate(
        ["?g", "?v"],
        Join(["?e"], MatchA("?e", "group", "?g"), MatchA("?e", "amount", "?v")),
        [AggregationFn.SUM],
        ["?g"],
        ["?v"],
    )
    assert rows(engine.implement(plan, ["g", "s"])) == [("a", 15), ("b", 2)]


def test_variance(engine):
    _amounts(engine)
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.VARIANCE],
        [],
        ["?v"],
    )
    # values 5, 10, 10, 2: mean=6.75, var = (sum sq)/4 - 6.75^2
    expected = (25 + 100 + 100 + 4) / 4 - 6.75**2
    got = rows(engine.implement(plan, ["v"]))
    assert len(got) == 1
    assert got[0][0] == pytest.approx(expected)


def test_stddev(engine):
    """STDDEV = sqrt(population variance) — completes the aggregate the
    reference declares but stubs out (aggregate_neu.rs:37-38)."""

    _amounts(engine)
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.STDDEV],
        [],
        ["?v"],
    )
    expected = ((25 + 100 + 100 + 4) / 4 - 6.75**2) ** 0.5
    got = rows(engine.implement(plan, ["v"]))
    assert len(got) == 1
    assert got[0][0] == pytest.approx(expected)


def test_multiple_aggregations(engine):
    """Reference: tests/aggregation_test.rs:478-640."""

    engine.create_attribute("group")
    engine.create_attribute("amount")
    engine.create_attribute("other")
    engine.transact(
        [
            Datom.add(1, "group", "a"),
            Datom.add(2, "group", "a"),
            Datom.add(1, "amount", 5),
            Datom.add(2, "amount", 10),
            Datom.add(1, "other", 100),
            Datom.add(2, "other", 200),
        ]
    )
    inner = Join(
        ["?e"],
        Join(["?e"], MatchA("?e", "group", "?g"), MatchA("?e", "amount", "?v")),
        MatchA("?e", "other", "?w"),
    )
    plan = Aggregate(
        ["?g", "?v", "?w"],
        inner,
        [AggregationFn.MIN, AggregationFn.MAX],
        ["?g"],
        ["?v", "?w"],
    )
    assert rows(engine.implement(plan, ["g", "minv", "maxw"])) == [("a", 5, 200)]


def test_exact_avg_variance_decimal(engine):
    """exact=True computes AVG/VARIANCE in Decimal(38,18) — the Spark
    stand-in for the reference's exact Rational32 results
    (aggregate_neu.rs:206): 1/3 keeps 18 exact fractional digits."""

    from decimal import Decimal
    from declarative_dataflow_spark.plan.plans import (
        Aggregate,
        AggregationFn,
        MatchA,
    )

    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "amount", 1),
            Datom.add(2, "amount", 1),
            Datom.add(3, "amount", 0),
        ]
    )
    plan = Aggregate(
        ["?v"],
        MatchA("?e", "amount", "?v"),
        [AggregationFn.AVG],
        [],
        ["?v"],
        with_variables=["?e"],
        exact=True,
    )
    [row] = engine.implement(plan).collect()
    assert str(row[0]) == "0.666666666666666667"  # 2/3 to 18 digits

    vplan = Aggregate(
        ["?v"],
        MatchA("?e", "amount", "?v"),
        [AggregationFn.VARIANCE],
        [],
        ["?v"],
        with_variables=["?e"],
        exact=True,
    )
    [vrow] = engine.implement(vplan).collect()
    # sumsq/n - (sum/n)^2 = 2/3 - 4/9 = 2/9
    assert abs(vrow[0] - Decimal(2) / Decimal(9)) <= Decimal("1e-17")


def test_median_ignores_overretracted(engine):
    """A tuple retracted below zero net weight must vanish from the
    median, not expand (sequence(1, n<1) descends in Spark)."""

    from declarative_dataflow_spark.plan.plans import (
        Aggregate,
        AggregationFn,
        MatchA,
    )

    engine.create_attribute("m")
    engine.transact(
        [
            Datom.add(1, "m", 5),
            Datom.add(2, "m", 7),
            Datom.retract(3, "m", 100),  # over-retraction: net -1
            Datom.retract(3, "m", 100),  # net -2
        ]
    )
    plan = Aggregate(
        ["?v"],
        MatchA("?e", "m", "?v"),
        [AggregationFn.MEDIAN],
        [],
        ["?v"],
        with_variables=["?e"],
    )
    [row] = engine.implement(plan).collect()
    assert row[0] == 7  # upper-middle of [5, 7]; 100 never appears


def test_order_stats_consolidate_retractions(engine):
    """A value asserted then retracted (separate +1/-1 rows) must not
    reach MIN/MAX/MEDIAN — the reference's differential reduce only
    sees the consolidated multiset (aggregate_neu.rs)."""

    engine.create_attribute("m2")
    engine.transact([Datom.add(1, "m2", 5), Datom.add(2, "m2", 7)])
    engine.transact([Datom.retract(1, "m2", 5)])
    for fn in (AggregationFn.MIN, AggregationFn.MAX, AggregationFn.MEDIAN):
        plan = Aggregate(
            ["?v"],
            MatchA("?e", "m2", "?v"),
            [fn],
            [],
            ["?v"],
            with_variables=["?e"],
        )
        assert rows(engine.implement(plan, ["v"])) == [(7,)]


def test_interleaved_find_order(engine):
    """[:find (min ?v) ?k ...] — output columns follow the plan's
    declared variable order (reference: aggregate_neu.rs:110-120
    output_offsets), not keys-then-aggregates."""

    engine.create_attribute("k")
    engine.create_attribute("v")
    engine.transact(
        [
            Datom.add(1, "k", "a"),
            Datom.add(1, "v", 10),
            Datom.add(2, "k", "a"),
            Datom.add(2, "v", 20),
            Datom.add(3, "k", "b"),
            Datom.add(3, "v", 30),
        ]
    )
    inner = Join(["?e"], MatchA("?e", "k", "?k"), MatchA("?e", "v", "?v"))
    plan = Aggregate(
        ["?v", "?k"],  # aggregate first, key second
        inner,
        [AggregationFn.MIN],
        ["?k"],
        ["?v"],
    )
    df = engine.implement(plan, ["minv", "k"])
    assert df.columns == ["minv", "k"]
    assert rows(df) == [(10, "a"), (30, "b")]


def test_rollup_and_cube(engine):
    """Rollup adds subtotal + grand-total rows with NULL keys; cube
    additionally adds the per-second-key margin."""

    engine.create_attribute("group")
    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "group", "a"), Datom.add(1, "amount", 5),
            Datom.add(2, "group", "a"), Datom.add(2, "amount", 10),
            Datom.add(3, "group", "b"), Datom.add(3, "amount", 2),
        ]
    )
    base = Join(
        ["?e"], MatchA("?e", "group", "?g"), MatchA("?e", "amount", "?v")
    )
    roll = Aggregate(
        ["?g", "?v"], base, [AggregationFn.SUM], ["?g"], ["?v"],
        grouping="rollup",
    )
    got = {(r[0], r[1]) for r in engine.implement(roll, ["g", "s"]).collect()}
    assert (None, 17) in got  # grand total
    assert ("a", 15) in got
    assert ("b", 2) in got

    cube = Aggregate(
        ["?g", "?v"], base, [AggregationFn.COUNT], ["?g"], ["?v"],
        grouping="cube",
    )
    got = {(r[0], r[1]) for r in engine.implement(cube, ["g", "n"]).collect()}
    assert (None, 3) in got  # grand total over 3 contributions

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bad = Aggregate(
            ["?g", "?v"], base, [AggregationFn.MEDIAN], ["?g"], ["?v"],
            grouping="rollup",
        )
        engine.implement(bad, ["g", "m"])


def test_exact_rational_avg_variance_wire_parity(engine):
    """exact='rational' reproduces the reference's Value::Rational32
    results (tests/aggregation_test.rs:320-425) as reduced (num, den)
    structs and round-trips them through the JSON wire encoding
    exactly as serde encodes Ratio: Ratio::new(20, 2) ships [10, 1]."""

    from fractions import Fraction

    from declarative_dataflow_spark.plan.plans import (
        Aggregate,
        AggregationFn,
        MatchA,
        Project,
    )
    from declarative_dataflow_spark.plan.wire import (
        decode_value,
        encode_value,
    )

    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "amount", 5),
            Datom.add(2, "amount", 10),
            Datom.add(2, "amount", 10),
            Datom.add(1, "amount", 2),
            Datom.add(1, "amount", 4),
            Datom.add(1, "amount", 6),
        ]
    )

    # Global AVG: 37/6 (bag semantics, aggregation_test.rs:345).
    plan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.AVG],
        [],
        ["?v"],
        exact="rational",
    )
    [row] = engine.implement(plan).collect()
    assert (row[0]["num"], row[0]["den"]) == (37, 6)

    # Keyed AVG: e1 -> 17/4, e2 -> Ratio::new(20, 2) == 10/1
    # (aggregation_test.rs:363-364 — num_rational reduces).
    kplan = Aggregate(
        ["?e", "?v"],
        MatchA("?e", "amount", "?v"),
        [AggregationFn.AVG],
        ["?e"],
        ["?v"],
        exact="rational",
    )
    got = {
        r[0]: (r[1]["num"], r[1]["den"])
        for r in engine.implement(kplan).collect()
    }
    assert got == {1: (17, 4), 2: (10, 1)}

    # Global VARIANCE: 317/36; keyed: e1 -> 35/16, e2 -> 0/1
    # (aggregation_test.rs:404,422-423).
    vplan = Aggregate(
        ["?v"],
        Project(["?v"], MatchA("?e", "amount", "?v")),
        [AggregationFn.VARIANCE],
        [],
        ["?v"],
        exact="rational",
    )
    [vrow] = engine.implement(vplan).collect()
    assert (vrow[0]["num"], vrow[0]["den"]) == (317, 36)
    vkplan = Aggregate(
        ["?e", "?v"],
        MatchA("?e", "amount", "?v"),
        [AggregationFn.VARIANCE],
        ["?e"],
        ["?v"],
        exact="rational",
    )
    vgot = {
        r[0]: (r[1]["num"], r[1]["den"])
        for r in engine.implement(vkplan).collect()
    }
    assert vgot == {1: (35, 16), 2: (0, 1)}

    # Wire round-trip: the struct encodes exactly as serde encodes
    # Ratio, and decoding returns the exact Fraction (no float loss).
    assert encode_value(row[0]) == {"Rational32": [37, 6]}
    assert encode_value(Fraction(20, 2)) == {"Rational32": [10, 1]}
    assert decode_value({"Rational32": [37, 6]}) == Fraction(37, 6)
    assert encode_value(decode_value({"Rational32": [35, 16]})) == {
        "Rational32": [35, 16]
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_value(Fraction(1 << 31, 1))  # i32 overflow guarded
