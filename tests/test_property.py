"""Property-based tests (hypothesis): wire-format round-trips over
randomly generated plan trees, and weighted-bag consolidation laws.
No Spark session needed — these are pure plan/value properties, so
hundreds of examples run in milliseconds."""

from hypothesis import given, settings, strategies as st

from declarative_dataflow_spark.plan.plans import (
    Aggregate,
    AggregationFn,
    Antijoin,
    AttributeBinding,
    BinaryPredicateBinding,
    ConstantBinding,
    Filter,
    Hector,
    Join,
    MatchA,
    MatchAV,
    MatchEA,
    Negate,
    Predicate,
    Project,
    Union,
)
from declarative_dataflow_spark.plan.wire import from_json, to_json

_vars = st.sampled_from(["?a", "?b", "?c", "?d", "?e"])
_aids = st.sampled_from(["name", "age", "edge", "ns/attr"])
_values = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(max_size=12),
    st.booleans(),
)


def _leaf():
    return st.one_of(
        st.builds(MatchA, _vars, _aids, _vars),
        st.builds(MatchEA, st.integers(0, 1000), _aids, _vars),
        st.builds(MatchAV, _vars, _aids, _values),
    )


def _bindings():
    return st.lists(
        st.one_of(
            st.builds(AttributeBinding, _vars, _aids, _vars),
            st.builds(ConstantBinding, _vars, _values),
            st.builds(
                BinaryPredicateBinding,
                st.lists(_vars, min_size=2, max_size=2),
                st.sampled_from(list(Predicate)),
            ),
        ),
        min_size=1,
        max_size=4,
    )


def _plans():
    return st.recursive(
        _leaf(),
        lambda inner: st.one_of(
            st.builds(
                Project, st.lists(_vars, min_size=1, max_size=3), inner
            ),
            st.builds(
                Join, st.lists(_vars, min_size=1, max_size=2), inner, inner
            ),
            st.builds(
                Antijoin,
                st.lists(_vars, min_size=1, max_size=2),
                inner,
                inner,
            ),
            st.builds(Negate, inner),
            st.builds(
                Union,
                st.lists(_vars, min_size=1, max_size=2),
                st.lists(inner, min_size=1, max_size=3),
            ),
            st.builds(
                Hector, st.lists(_vars, min_size=1, max_size=3), _bindings()
            ),
            st.builds(
                Filter,
                st.lists(_vars, min_size=2, max_size=2),
                st.sampled_from(list(Predicate)),
                inner,
                st.just({}),
            ),
            st.builds(
                Aggregate,
                st.lists(_vars, min_size=1, max_size=2),
                inner,
                st.lists(
                    st.sampled_from(list(AggregationFn)),
                    min_size=1,
                    max_size=2,
                ),
                st.lists(_vars, min_size=0, max_size=2),
                st.lists(_vars, min_size=1, max_size=2),
                st.lists(_vars, min_size=0, max_size=1),
                st.booleans(),
            ),
        ),
        max_leaves=6,
    )


@settings(max_examples=300, deadline=None)
@given(_plans())
def test_wire_roundtrip_arbitrary_plans(plan):
    assert from_json(to_json(plan)) == plan


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),
            st.integers(0, 5),
            st.integers(-3, 3).filter(lambda d: d != 0),
        ),
        max_size=30,
    )
)
def test_consolidation_is_net_weight(rows):
    """Pure-python model of Relation.consolidated: net weight per
    tuple, zero-net tuples vanish, order irrelevant."""

    from collections import Counter

    acc = Counter()
    for e, v, d in rows:
        acc[(e, v)] += d
    consolidated = {k: w for k, w in acc.items() if w != 0}
    # Permutation invariance.
    acc2 = Counter()
    for e, v, d in reversed(rows):
        acc2[(e, v)] += d
    assert consolidated == {k: w for k, w in acc2.items() if w != 0}
