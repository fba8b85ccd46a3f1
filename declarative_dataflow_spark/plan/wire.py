"""JSON wire format for plans — parity with the reference's serde
encoding (externally-tagged enums; server/tests/serialization.rs,
README.md:79-88). Clients of the reference send ``Vec<Request>`` JSON
with Plan trees like::

    {"Join": {"variables": [0],
              "left_plan": {"MatchA": [0, ":name", 1]},
              "right_plan": {"MatchA": [0, ":age", 2]}}}

Values use serde's representation (src/lib.rs:85-106): strings, bools
and i64 numbers are plain JSON; the rest are single-key objects such as
``{"Eid": 5}``, ``{"Aid": ":edge"}``, ``{"Instant": 0}``,
``{"Uuid": "..."}``.

Bindings (src/binding/mod.rs:53-62) are tagged
``{"Attribute": {"variables": [e, v], "source_attribute": aid}}``,
``{"Constant": {"variable": x, "value": v}}``,
``{"BinaryPredicate": {"variables": [x, y], "predicate": "LT"}}``,
``{"Not": {"variables": [e, v], "source_attribute": aid}}``.
"""

from __future__ import annotations

import json
from typing import Any

from .plans import (
    Aggregate,
    AggregationFn,
    Antijoin,
    AntijoinBinding,
    AttributeBinding,
    BinaryPredicateBinding,
    ConstantBinding,
    Filter,
    Function,
    Hector,
    Join,
    MatchA,
    MatchAV,
    MatchEA,
    NameExpr,
    Negate,
    Plan,
    Predicate,
    Project,
    Pull,
    PullAll,
    PullLevel,
    TopK,
    Transform,
    Union,
)


# I16F16 scale: 16 fractional bits. 1/65536 is exactly representable
# in decimal (0.0000152587890625), so every I16F16 value round-trips
# through Decimal with zero error — the exactness the reference gets
# from its fixed-point type (src/lib.rs:104-105).
_REAL_SCALE = 65536
_REAL_MIN = -(1 << 31)
_REAL_MAX = (1 << 31) - 1


def encode_value(v: Any) -> Any:
    """Python value -> reference Value JSON."""

    from decimal import Decimal
    from fractions import Fraction

    if isinstance(v, dict):
        return v  # already tagged
    if isinstance(v, Fraction):
        # Rational32 rides as [numer, denom], reduced with a positive
        # denominator — exactly serde's encoding of num_rational's
        # Ratio (src/lib.rs:96; Fraction normalizes identically, so
        # Fraction(20, 2) ships as [10, 1] like Ratio::new(20, 2)).
        num, den = v.numerator, v.denominator
        if not (
            -(1 << 31) <= num <= (1 << 31) - 1
            and 0 < den <= (1 << 31) - 1
        ):
            raise ValueError(f"Rational32 out of i32 range: {v}")
        return {"Rational32": [num, den]}
    if hasattr(v, "__fields__") and list(v.__fields__) == ["num", "den"]:
        # A struct(num, den) row from Aggregate(exact="rational") —
        # already reduced; Fraction re-normalizes harmlessly and the
        # i32 range check applies.
        return encode_value(Fraction(int(v[0]), int(v[1])))
    if isinstance(v, Decimal):
        # Exact reals ride the wire as Real(I16F16 raw bits). Values
        # off the 2^-16 grid quantize to the nearest representable
        # fixed-point number — the reference's own resolution limit.
        raw = int(
            (v * _REAL_SCALE).to_integral_value()
        )
        if not _REAL_MIN <= raw <= _REAL_MAX:
            raise ValueError(f"Real out of I16F16 range: {v}")
        return {"Real": raw}
    return v  # str/bool/int are plain in serde


def decode_value(v: Any) -> Any:
    """Reference Value JSON -> Python value."""

    if isinstance(v, dict):
        tag, inner = next(iter(v.items()))
        if tag in ("Eid", "Number", "Instant"):
            return int(inner)
        if tag in ("Aid", "String", "Uuid"):
            return str(inner)
        if tag == "Bool":
            return bool(inner)
        if tag == "Rational32":
            # Exact: the reference's rationals must round-trip without
            # binary-float loss (Fraction re-encodes to the identical
            # [num, den] — num_rational keeps ratios reduced, so no
            # information is added or lost either way).
            from fractions import Fraction

            num, den = inner
            return Fraction(num, den)
        if tag == "Real":
            # Feature-gated I16F16 fixed point (reference:
            # src/lib.rs:104-105): raw i32 with 16 fractional bits,
            # decoded EXACTLY into Decimal (never binary float — users
            # of Real rely on exact fixed-point arithmetic).
            from decimal import Decimal

            raw = int(inner)
            if not _REAL_MIN <= raw <= _REAL_MAX:
                raise ValueError(f"Real out of I16F16 range: {raw}")
            return Decimal(raw) / _REAL_SCALE
        if tag == "Cas":
            # Extension: the reference's CAS operator never shipped, so
            # it has no wire shape; a tagged (expected_old,
            # proposed_new) pair (nulls = absent) completes it for
            # CompareAndSwap attributes.
            old, new = inner
            return (
                None if old is None else decode_value(old),
                None if new is None else decode_value(new),
            )
        raise ValueError(f"unknown Value tag {tag}")
    return v


def plan_to_dict(plan: Plan) -> dict:
    if isinstance(plan, MatchA):
        return {"MatchA": [plan.e, plan.attribute, plan.v]}
    if isinstance(plan, MatchEA):
        return {"MatchEA": [plan.entity, plan.attribute, plan.v]}
    if isinstance(plan, MatchAV):
        return {"MatchAV": [plan.e, plan.attribute, encode_value(plan.value)]}
    if isinstance(plan, NameExpr):
        return {"NameExpr": [list(plan.variables_), plan.name]}
    if isinstance(plan, Project):
        return {
            "Project": {
                "variables": list(plan.variables_),
                "plan": plan_to_dict(plan.plan),
            }
        }
    if isinstance(plan, Negate):
        return {"Negate": plan_to_dict(plan.plan)}
    if isinstance(plan, Join):
        return {
            "Join": {
                "variables": list(plan.variables_),
                "left_plan": plan_to_dict(plan.left_plan),
                "right_plan": plan_to_dict(plan.right_plan),
            }
        }
    if isinstance(plan, Antijoin):
        return {
            "Antijoin": {
                "variables": list(plan.variables_),
                "left_plan": plan_to_dict(plan.left_plan),
                "right_plan": plan_to_dict(plan.right_plan),
            }
        }
    if isinstance(plan, Union):
        return {
            "Union": {
                "variables": list(plan.variables_),
                "plans": [plan_to_dict(p) for p in plan.plans],
            }
        }
    if isinstance(plan, Filter):
        return {
            "Filter": {
                "variables": list(plan.variables_),
                "predicate": plan.predicate.value,
                "plan": plan_to_dict(plan.plan),
                "constants": {
                    str(k): encode_value(v) for k, v in plan.constants.items()
                },
            }
        }
    if isinstance(plan, Transform):
        return {
            "Transform": {
                "variables": list(plan.variables_),
                "result_variable": plan.result_variable,
                "plan": plan_to_dict(plan.plan),
                "function": plan.function.value,
                "constants": {
                    str(k): encode_value(v) for k, v in plan.constants.items()
                },
            }
        }
    if isinstance(plan, Aggregate):
        body = {
            "variables": list(plan.variables_),
            "plan": plan_to_dict(plan.plan),
            "aggregation_fns": [f.value for f in plan.aggregation_fns],
            "key_variables": list(plan.key_variables),
            "aggregation_variables": list(plan.aggregation_variables),
            "with_variables": list(plan.with_variables),
        }
        # Extension over the reference wire format; omitted when False
        # so reference-shaped documents stay byte-identical.
        if plan.exact:
            body["exact"] = True
        if plan.grouping is not None:
            body["grouping"] = plan.grouping
        return {"Aggregate": body}
    if isinstance(plan, TopK):
        # Extension tag: the reference has no ordering operator
        # (ordering is delegated to clients); TopK completes that gap
        # (SURVEY §2.2) with an explicit wire shape.
        return {
            "TopK": {
                "variables": list(plan.variables_),
                "plan": plan_to_dict(plan.plan),
                "order_by": [[v, bool(asc)] for v, asc in plan.order_by],
                "k": plan.k,
                "partition_by": list(plan.partition_by),
            }
        }
    if isinstance(plan, Hector):
        return {
            "Hector": {
                "variables": list(plan.variables_),
                "bindings": [binding_to_dict(b) for b in plan.bindings],
            }
        }
    if isinstance(plan, PullLevel):
        inner = {
            "variables": list(plan.variables_),
            "plan": plan_to_dict(plan.plan),
            "pull_variable": plan.pull_variable,
            "pull_attributes": list(plan.pull_attributes),
            "path_attributes": list(plan.path_attributes),
            "cardinality_many": plan.cardinality_many,
        }
        if plan.pull_aliases is not None:
            inner["pull_aliases"] = list(plan.pull_aliases)
        return {"PullLevel": inner}
    if isinstance(plan, Pull):
        return {
            "Pull": {
                "variables": list(plan.variables_),
                "paths": [plan_to_dict(p)["PullLevel"] for p in plan.paths],
            }
        }
    if isinstance(plan, PullAll):
        return {
            "PullAll": {
                "variables": list(plan.variables_),
                "pull_attributes": list(plan.pull_attributes),
            }
        }
    raise TypeError(f"cannot serialize {type(plan).__name__}")


def binding_to_dict(b: Any) -> dict:
    if isinstance(b, AttributeBinding):
        return {
            "Attribute": {
                "variables": [b.e, b.v],
                "source_attribute": b.attribute,
            }
        }
    if isinstance(b, ConstantBinding):
        return {
            "Constant": {"variable": b.variable, "value": encode_value(b.value)}
        }
    if isinstance(b, BinaryPredicateBinding):
        return {
            "BinaryPredicate": {
                "variables": list(b.variables_),
                "predicate": b.predicate.value,
            }
        }
    if isinstance(b, AntijoinBinding):
        return {
            "Not": {
                "variables": [b.e, b.v],
                "source_attribute": b.attribute,
            }
        }
    raise TypeError(f"cannot serialize binding {type(b).__name__}")


def binding_from_dict(d: dict) -> Any:
    tag, inner = next(iter(d.items()))
    if tag == "Attribute":
        e, v = inner["variables"]
        return AttributeBinding(e, inner["source_attribute"], v)
    if tag == "Constant":
        return ConstantBinding(inner["variable"], decode_value(inner["value"]))
    if tag == "BinaryPredicate":
        return BinaryPredicateBinding(
            list(inner["variables"]), Predicate(inner["predicate"])
        )
    if tag == "Not":
        e, v = inner["variables"]
        return AntijoinBinding(e, inner["source_attribute"], v)
    raise ValueError(f"unknown binding tag {tag}")


def plan_from_dict(d: dict) -> Plan:
    tag, inner = next(iter(d.items()))
    if tag == "MatchA":
        e, a, v = inner
        return MatchA(e, a, v)
    if tag == "MatchEA":
        e, a, v = inner
        return MatchEA(e, a, v)
    if tag == "MatchAV":
        e, a, v = inner
        return MatchAV(e, a, decode_value(v))
    if tag == "NameExpr":
        variables, name = inner
        return NameExpr(list(variables), name)
    if tag == "Project":
        return Project(list(inner["variables"]), plan_from_dict(inner["plan"]))
    if tag == "Negate":
        return Negate(plan_from_dict(inner))
    if tag == "Join":
        return Join(
            list(inner["variables"]),
            plan_from_dict(inner["left_plan"]),
            plan_from_dict(inner["right_plan"]),
        )
    if tag == "Antijoin":
        return Antijoin(
            list(inner["variables"]),
            plan_from_dict(inner["left_plan"]),
            plan_from_dict(inner["right_plan"]),
        )
    if tag == "Union":
        return Union(
            list(inner["variables"]),
            [plan_from_dict(p) for p in inner["plans"]],
        )
    if tag == "Filter":
        return Filter(
            list(inner["variables"]),
            Predicate(inner["predicate"]),
            plan_from_dict(inner["plan"]),
            {int(k): decode_value(v) for k, v in inner.get("constants", {}).items()},
        )
    if tag == "Transform":
        return Transform(
            list(inner["variables"]),
            inner["result_variable"],
            plan_from_dict(inner["plan"]),
            Function(inner["function"]),
            {int(k): decode_value(v) for k, v in inner.get("constants", {}).items()},
        )
    if tag == "Aggregate":
        return Aggregate(
            list(inner["variables"]),
            plan_from_dict(inner["plan"]),
            [AggregationFn(f) for f in inner["aggregation_fns"]],
            list(inner["key_variables"]),
            list(inner["aggregation_variables"]),
            list(inner.get("with_variables", [])),
            exact=bool(inner.get("exact", False)),
            grouping=inner.get("grouping"),
        )
    if tag == "TopK":
        return TopK(
            list(inner["variables"]),
            plan_from_dict(inner["plan"]),
            [(v, bool(asc)) for v, asc in inner["order_by"]],
            int(inner["k"]),
            list(inner.get("partition_by", [])),
        )
    if tag == "Hector":
        return Hector(
            list(inner["variables"]),
            [binding_from_dict(b) for b in inner["bindings"]],
        )
    if tag == "PullLevel":
        return _pull_level_from_dict(inner)
    if tag == "Pull":
        return Pull(
            list(inner["variables"]),
            [_pull_level_from_dict(p) for p in inner["paths"]],
        )
    if tag == "PullAll":
        return PullAll(
            list(inner["variables"]), list(inner["pull_attributes"])
        )
    raise ValueError(f"unknown plan tag {tag}")


def _pull_level_from_dict(inner: dict) -> PullLevel:
    aliases = inner.get("pull_aliases")
    return PullLevel(
        list(inner["variables"]),
        plan_from_dict(inner["plan"]),
        inner["pull_variable"],
        list(inner["pull_attributes"]),
        list(inner.get("path_attributes", [])),
        bool(inner.get("cardinality_many", False)),
        list(aliases) if aliases is not None else None,
    )


def to_json(plan: Plan) -> str:
    return json.dumps(plan_to_dict(plan))


def from_json(s: str) -> Plan:
    return plan_from_dict(json.loads(s))
