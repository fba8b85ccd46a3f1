"""Property-based tests (hypothesis): wire-format round-trips over
randomly generated plan trees, and weighted-bag consolidation laws.
No Spark session needed — these are pure plan/value properties, so
hundreds of examples run in milliseconds."""

from hypothesis import given, settings, strategies as st

from declarative_dataflow_spark.plan.plans import (
    Aggregate,
    TopK,
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
                TopK,
                st.lists(_vars, min_size=1, max_size=2),
                inner,
                st.lists(
                    st.tuples(_vars, st.booleans()), min_size=1, max_size=2
                ),
                st.integers(1, 100),
                st.lists(_vars, max_size=2),
            ),
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


# ---------------------------------------------------------------------------
# Differential semantics: random conjunctions vs a naive Python model
# ---------------------------------------------------------------------------


def _model_eval(patterns, facts):
    """Naive bag-semantics conjunction evaluator: nested loops over the
    fact lists, one binding environment per derivation."""

    envs = [dict()]
    for (evar, aid, vterm) in patterns:
        nxt = []
        for env in envs:
            for (fe, fv) in facts.get(aid, []):
                e2 = dict(env)
                if evar in e2:
                    if e2[evar] != fe:
                        continue
                else:
                    e2[evar] = fe
                if isinstance(vterm, str) and vterm.startswith("?"):
                    if vterm in e2:
                        if e2[vterm] != fv:
                            continue
                    else:
                        e2[vterm] = fv
                else:
                    if fv != vterm:
                        continue
                nxt.append(e2)
        envs = nxt
    return envs


@settings(max_examples=10, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_conjunctions_match_model(spark, data):
    """Differential gate: the Hector compiler (scan fusion, join
    chains, WCO lowering — whatever it picks) agrees with a nested-loop
    Python evaluator on random connected conjunctions over random small
    fact sets, INCLUDING duplicate facts (bag multiplicities)."""

    from collections import Counter

    from declarative_dataflow_spark.engine import Datom, Engine
    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        ConstantBinding,
        Hector,
    )

    aids = ["p_edge", "p_name"]
    # Random facts: small ids/values so joins actually hit.
    facts = {
        aid: data.draw(
            st.lists(
                st.tuples(st.integers(1, 4), st.integers(1, 4)),
                min_size=1,
                max_size=6,
            ),
            label=f"facts[{aid}]",
        )
        for aid in aids
    }

    # Connected chain of 2-3 patterns: each reuses a previous variable.
    n_patterns = data.draw(st.integers(2, 3), label="n_patterns")
    pool = ["?a", "?b", "?c", "?d"]
    patterns = []
    used = []
    for i in range(n_patterns):
        aid = data.draw(st.sampled_from(aids), label=f"aid{i}")
        if used:
            evar = data.draw(st.sampled_from(used), label=f"e{i}")
        else:
            evar = pool[0]
        fresh = [v for v in pool if v not in used]
        options = [st.sampled_from(fresh or pool), st.integers(1, 4)]
        if used:
            options.append(st.sampled_from(used))
        vterm = data.draw(st.one_of(*options), label=f"v{i}")
        patterns.append((evar, aid, vterm))
        for t in (evar, vterm):
            if isinstance(t, str) and t.startswith("?") and t not in used:
                used.append(t)

    envs = _model_eval(patterns, facts)

    # Optionally one comparison predicate over two bound variables.
    pred = None
    if len(used) >= 2:
        if data.draw(st.booleans(), label="use_pred"):
            import operator

            pv1 = data.draw(st.sampled_from(used), label="pv1")
            pv2 = data.draw(
                st.sampled_from([v for v in used if v != pv1]), label="pv2"
            )
            op_name = data.draw(
                st.sampled_from(["LT", "GT", "LTE"]), label="op"
            )
            pred = (pv1, op_name, pv2)
            py_op = {"LT": operator.lt, "GT": operator.gt, "LTE": operator.le}[
                op_name
            ]
            envs = [e for e in envs if py_op(e[pv1], e[pv2])]

    find = sorted(used)
    expected = Counter(tuple(env[v] for v in find) for env in envs)

    eng = Engine(spark)
    for aid in aids:
        eng.create_attribute(aid)
        eng.transact([Datom.add(e, aid, v) for e, v in facts[aid]])
    bindings = []
    for (evar, aid, vterm) in patterns:
        if isinstance(vterm, int):
            tmp = f"?__c{len(bindings)}"
            bindings.append(AttributeBinding(evar, aid, tmp))
            bindings.append(ConstantBinding(tmp, vterm))
        else:
            bindings.append(AttributeBinding(evar, aid, vterm))
    if pred is not None:
        from declarative_dataflow_spark.plan.plans import (
            BinaryPredicateBinding as BPB,
            Predicate,
        )

        # Hector predicate bindings are reversed: LT((x, y)) admits
        # y < x, so "pv1 OP pv2" is expressed as (pv2, pv1).
        bindings.append(
            BPB([pred[2], pred[0]], Predicate(pred[1]))
        )
    df = eng.implement(Hector(find, bindings))
    got = Counter()
    for r in df.collect():
        t = tuple(r)
        if "diff" in df.columns:
            got[t[:-1]] += t[-1]
        else:
            got[t] += 1
    assert got == expected, (patterns, facts)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 5), st.integers(1, 5)),
        min_size=1,
        max_size=8,
    ),
    nonlinear=st.booleans(),
)
def test_random_graph_closure_matches_model(spark, edges, nonlinear):
    """Differential recursion gate: the fixpoint evaluator (semi-naive,
    linear or non-linear path per the rule shape) equals a Python
    transitive closure on random graphs, cycles included."""

    from declarative_dataflow_spark.engine import Datom, Engine
    from declarative_dataflow_spark.plan.plans import (
        Join,
        MatchA,
        NameExpr,
        Union,
    )

    # Python model: warshall closure
    closure = set(edges)
    changed = True
    while changed:
        changed = False
        for (a, b) in list(closure):
            for (c, d) in list(closure):
                if b == c and (a, d) not in closure:
                    closure.add((a, d))
                    changed = True

    eng = Engine(spark)
    eng.create_attribute("e")
    eng.transact([Datom.add(a, "e", b) for a, b in edges])
    if nonlinear:
        rec = Join(
            ["?m"],
            NameExpr(["?x", "?m"], "r"),
            NameExpr(["?m", "?y"], "r"),
        )
    else:
        rec = Join(
            ["?m"], NameExpr(["?x", "?m"], "r"), MatchA("?m", "e", "?y")
        )
    eng.register("r", Union(["?x", "?y"], [MatchA("?x", "e", "?y"), rec]))
    got = {tuple(r) for r in eng.interest("r", ["x", "y"]).collect()}
    assert got == closure, (edges, nonlinear)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    facts=st.lists(
        st.tuples(st.integers(1, 3), st.integers(-5, 5)),
        min_size=1,
        max_size=10,
    ),
    fn_name=st.sampled_from(["COUNT", "SUM", "MIN", "MAX", "MEDIAN"]),
)
def test_random_grouped_aggregates_match_model(spark, facts, fn_name):
    """Differential aggregation gate: grouped COUNT/SUM/MIN/MAX/MEDIAN
    over random weighted facts equals a Python model (MEDIAN uses the
    reference's upper-middle element)."""

    from collections import Counter, defaultdict

    from declarative_dataflow_spark.engine import Datom, Engine
    from declarative_dataflow_spark.plan.plans import (
        Aggregate,
        AggregationFn,
        MatchA,
    )

    groups = defaultdict(list)
    for e, v in facts:
        groups[e].append(v)

    def model(vals):
        vals = sorted(vals)
        if fn_name == "COUNT":
            return len(vals)
        if fn_name == "SUM":
            return sum(vals)
        if fn_name == "MIN":
            return vals[0]
        if fn_name == "MAX":
            return vals[-1]
        return vals[len(vals) // 2]  # upper-middle MEDIAN

    expected = Counter({(e, model(vs)): 1 for e, vs in groups.items()})

    eng = Engine(spark)
    eng.create_attribute("pv")
    eng.transact([Datom.add(e, "pv", v) for e, v in facts])
    eng.register(
        "agg",
        Aggregate(
            ["?e", "?v"],
            MatchA("?e", "pv", "?v"),
            [AggregationFn[fn_name]],
            ["?e"],
            ["?v"],
        ),
    )
    df = eng.interest("agg")
    if "diff" in df.columns:
        df = df.drop("diff")
    got = Counter(tuple(r) for r in df.collect())
    assert got == expected, (facts, fn_name)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    pos=st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 4)),
        min_size=1,
        max_size=8,
    ),
    neg=st.lists(st.integers(1, 4), max_size=4),
)
def test_random_antijoin_matches_model(spark, pos, neg):
    """Differential negation gate: [?a :p ?b] (not [?b :n _]) equals
    the Python set difference on random facts (set semantics — the
    reference distincts both antijoin sides)."""

    from declarative_dataflow_spark.engine import Datom, Engine
    from declarative_dataflow_spark.plan.plans import (
        Antijoin,
        MatchA,
        Project,
    )

    blocked = set(neg)
    expected = {(a, b) for a, b in pos if b not in blocked}

    eng = Engine(spark)
    eng.create_attribute("pp")
    eng.create_attribute("pn")
    eng.transact([Datom.add(a, "pp", b) for a, b in pos])
    eng.transact([Datom.add(b, "pn", 1) for b in blocked])
    df = eng.implement(
        Antijoin(
            ["?b"],
            MatchA("?a", "pp", "?b"),
            Project(["?b"], MatchA("?b", "pn", "?c")),
        )
    )
    if "diff" in df.columns:
        df = df.drop("diff")
    got = {tuple(r) for r in df.collect()}
    assert got == expected, (pos, neg)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    writes=st.lists(
        st.tuples(
            st.integers(1, 3),          # entity
            st.integers(1, 4),          # value
            st.integers(0, 3),          # event time (ties likely)
            st.sampled_from([1, 1, 1, -1]),  # mostly adds
        ),
        min_size=1,
        max_size=12,
    )
)
def test_random_lww_matches_model(spark, writes):
    """Differential input-semantics gate: LastWriteWins over random
    (possibly tied, possibly retracted) writes equals the Python state
    model — latest event time wins, ties resolve by arrival order, a
    retraction deletes only if it matches the current winner."""

    from declarative_dataflow_spark.engine import (
        AttributeConfig,
        Datom,
        Engine,
        InputSemantics,
    )
    from declarative_dataflow_spark.plan.plans import MatchA

    # Model: keep all rows, winner per entity = max (t, seq) with
    # positive diff at the top of the stack after sorting.
    by_e = {}
    for seq, (e, v, t, diff) in enumerate(writes):
        by_e.setdefault(e, []).append((t, seq, v, diff))
    expected = set()
    for e, rows_ in by_e.items():
        top = max(rows_)  # (t, seq) lexicographic — arrival breaks ties
        if top[3] > 0:
            expected.add((e, top[2]))

    eng = Engine(spark)
    eng.create_attribute(
        "lwwp", AttributeConfig(input_semantics=InputSemantics.LAST_WRITE_WINS)
    )
    eng.transact(
        [Datom(e, "lwwp", v, t, diff) for (e, v, t, diff) in writes]
    )
    df = eng.implement(MatchA("?e", "lwwp", "?v"))
    if "diff" in df.columns:
        df = df.drop("diff")
    got = {tuple(r) for r in df.collect()}
    assert got == expected, writes


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    writes=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(1, 3),
            st.sampled_from([1, 1, -1]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_random_distinct_matches_model(spark, writes):
    """Distinct ingest: a (e, v) pair is present iff its net weight is
    positive, regardless of duplicate adds or over-retraction order."""

    from collections import Counter

    from declarative_dataflow_spark.engine import (
        AttributeConfig,
        Datom,
        Engine,
        InputSemantics,
    )
    from declarative_dataflow_spark.plan.plans import MatchA

    net = Counter()
    for e, v, diff in writes:
        net[(e, v)] += diff
    expected = {k for k, w in net.items() if w > 0}

    eng = Engine(spark)
    eng.create_attribute(
        "dsp", AttributeConfig(input_semantics=InputSemantics.DISTINCT)
    )
    eng.transact([Datom(e, "dsp", v, None, diff) for e, v, diff in writes])
    df = eng.implement(MatchA("?e", "dsp", "?v"))
    if "diff" in df.columns:
        df = df.drop("diff")
    got = {tuple(r) for r in df.collect()}
    assert got == expected, writes


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 3),                       # entity
            st.one_of(st.none(), st.integers(0, 4)),  # expected_old
            st.one_of(st.none(), st.integers(0, 4)),  # proposed_new
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_random_cas_matches_model(spark, ops):
    """Differential CAS gate: random op sequences fold to the same
    registers as a Python model (op i at time i — total order)."""

    from collections import Counter

    from declarative_dataflow_spark.engine import (
        AttributeConfig,
        Datom,
        Engine,
        InputSemantics,
    )
    from declarative_dataflow_spark import MatchA

    model: dict = {}
    for e, old, new in ops:
        if model.get(e) == old:
            if new is None:
                model.pop(e, None)
            else:
                model[e] = new
    expected = Counter({(e, v): 1 for e, v in model.items()})

    eng = Engine(spark)
    eng.create_attribute(
        "r", AttributeConfig(input_semantics=InputSemantics.COMPARE_AND_SWAP)
    )
    eng.transact(
        [Datom.cas(e, "r", old, new, t=i) for i, (e, old, new) in enumerate(ops)]
    )
    df = eng.implement(MatchA("?e", "r", "?v"), ["e", "v"])
    got = Counter()
    for r in df.collect():
        t = tuple(r)
        got[t[:2]] += t[2] if len(t) == 3 else 1
    assert got == expected, ops
