"""JSON wire-format parity (reference: serde externally-tagged enums,
server/tests/serialization.rs)."""

from declarative_dataflow_spark import (
    Aggregate,
    AggregationFn,
    AttributeBinding,
    BinaryPredicateBinding,
    ConstantBinding,
    Filter,
    Hector,
    Join,
    MatchA,
    MatchAV,
    Predicate,
    Project,
    Union,
)
from declarative_dataflow_spark.plan import wire


def test_roundtrip_join():
    plan = Join(
        [0], MatchA(0, ":name", 1), MatchA(0, ":age", 2)
    )
    s = wire.to_json(plan)
    assert wire.to_json(wire.from_json(s)) == s


def test_reference_shape_decodes():
    """Hand-written JSON in the reference's wire shape."""

    s = (
        '{"Join": {"variables": [0], '
        '"left_plan": {"MatchA": [0, ":name", 1]}, '
        '"right_plan": {"MatchA": [0, ":age", 2]}}}'
    )
    plan = wire.from_json(s)
    assert isinstance(plan, Join)
    assert plan.left_plan.attribute == ":name"
    assert plan.variables() == [0, 1, 2]


def test_matchav_tagged_value():
    plan = wire.from_json('{"MatchAV": [0, ":id", {"Eid": 5}]}')
    assert plan.value == 5
    plan = wire.from_json('{"MatchAV": [0, ":name", "Mabel"]}')
    assert plan.value == "Mabel"


def test_hector_bindings_roundtrip():
    plan = Hector(
        [0, 2],
        [
            AttributeBinding(0, ":edge", 1),
            AttributeBinding(1, ":edge", 2),
            ConstantBinding(2, 10),
            BinaryPredicateBinding([0, 2], Predicate.LT),
        ],
    )
    s = wire.to_json(plan)
    back = wire.from_json(s)
    assert wire.to_json(back) == s
    assert back.bindings[3].predicate == Predicate.LT


def test_aggregate_roundtrip():
    plan = Aggregate(
        [0, 1],
        Project([0, 1], MatchA(0, ":amount", 1)),
        [AggregationFn.SUM],
        [0],
        [1],
        [2],
    )
    s = wire.to_json(plan)
    assert wire.from_json(s).aggregation_fns == [AggregationFn.SUM]


def test_union_filter_roundtrip():
    plan = Union(
        [0],
        [
            Filter([1], Predicate.GT, MatchA(0, ":age", 1), {1: 12}),
            MatchAV(0, ":name", "Soos"),
        ],
    )
    s = wire.to_json(plan)
    back = wire.from_json(s)
    assert back.plans[0].constants == {1: 12}


def test_decode_real_fixed_point():
    """Feature-gated Real(I16F16) values decode EXACTLY to Decimal
    (reference: src/lib.rs:104-105 — fixed point, not binary float)."""

    from decimal import Decimal

    from declarative_dataflow_spark.plan.wire import decode_value

    assert decode_value({"Real": 98304}) == Decimal("1.5")
    assert decode_value({"Real": -65536}) == Decimal("-1")
    assert isinstance(decode_value({"Real": 98304}), Decimal)
    # The smallest step is exact in decimal — no float in the path.
    assert decode_value({"Real": 1}) == Decimal("0.0000152587890625")


def test_real_round_trips_exactly():
    """decode -> encode is the identity on EVERY I16F16 raw value —
    the exactness contract a float intermediate cannot honor (e.g.
    raw values whose quotient is not a binary float)."""

    from declarative_dataflow_spark.plan.wire import (
        decode_value,
        encode_value,
    )

    for raw in [0, 1, -1, 3, 98304, 6554, 2**31 - 1, -(2**31), 12345679]:
        assert encode_value(decode_value({"Real": raw})) == {"Real": raw}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_value({"Real": 2**31})  # beyond i32: reference overflow


def test_serialization_reference_values():
    """The exact JSON shapes of the reference's serialization test
    (server/tests/serialization.rs): tagged Aid/Instant/Uuid, plain
    String/Bool/Number."""

    import json

    from declarative_dataflow_spark.plan.wire import (
        decode_value,
        encode_value,
    )

    cases = [
        ({"Aid": ":edge"}, ":edge"),
        ("foo", "foo"),
        (True, True),
        (44, 44),
        ({"Instant": 0}, 0),
        (
            {"Uuid": "71828aae-4fc8-421b-82ca-68c5f4981d74"},
            "71828aae-4fc8-421b-82ca-68c5f4981d74",
        ),
    ]
    for wire, py in cases:
        assert decode_value(wire) == py
        # Every encoded form is JSON-serializable in serde's shape.
        json.dumps(encode_value(wire))
