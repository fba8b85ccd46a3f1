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
    """Feature-gated Real(I16F16) values decode as raw/2^16
    (reference: src/lib.rs:104-105)."""

    from declarative_dataflow_spark.plan.wire import decode_value

    assert decode_value({"Real": 98304}) == 1.5
    assert decode_value({"Real": -65536}) == -1.0
