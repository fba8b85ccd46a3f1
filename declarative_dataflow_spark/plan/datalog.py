"""Datalog text front-end: `[:find ... :where ...]` query strings.

The reference serves plans as JSON and leaves the Datalog surface
syntax to its Clojure client clj-3df (README.md:33-36); its own test
suite nonetheless DESCRIBES every case in that syntax
(tests/query_test.rs:126+). This module parses that exact notation so
reference users can port queries verbatim:

    [:find ?e ?n :where [?e :name ?n]]
    [:find ?e :where [?e :name Mabel]]
    [:find (sum ?amount) :with ?e :where [?e :amount ?amount]]
    [:find ?e :where (or [?e :name Oleg] [?e :age 10])]
    [:find ?e ?a :where [?e :age ?a] [(< ?a 18)] (not [?e :name Mabel])]

Supported: patterns (entity/value constants or wildcards), binary
predicates, (not ...) antijoins, (or ...) / (or-join [vars] ...)
unions, aggregates min max count sum avg median variance, and :with.
Compiles onto the ordinary plan algebra — Hector for conjunctions,
Union, Antijoin, Aggregate — so Catalyst sees the same plans as the
programmatic API.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from .plans import (
    Aggregate,
    AggregationFn,
    Antijoin,
    AttributeBinding,
    BinaryPredicateBinding,
    ConstantBinding,
    Hector,
    Join,
    MatchA,
    MatchAV,
    MatchEA,
    Plan,
    Predicate,
    Project,
    Union,
)

_TOKEN = re.compile(
    r"""\s*(?:(?P<open>[\[(])|(?P<close>[\])])|(?P<string>"(?:[^"\\]|\\.)*")"""
    r"""|(?P<atom>[^\s\[\]()"]+))"""
)

_PREDICATES = {
    "<": Predicate.LT,
    ">": Predicate.GT,
    "<=": Predicate.LTE,
    ">=": Predicate.GTE,
    "=": Predicate.EQ,
    "!=": Predicate.NEQ,
}

_AGGREGATES = {
    "min": AggregationFn.MIN,
    "max": AggregationFn.MAX,
    "count": AggregationFn.COUNT,
    "sum": AggregationFn.SUM,
    "avg": AggregationFn.AVG,
    "median": AggregationFn.MEDIAN,
    "variance": AggregationFn.VARIANCE,
    "stddev": AggregationFn.STDDEV,
}


def _read(text: str) -> Any:
    """Parse one EDN-ish form into nested lists of atoms."""

    pos = 0
    stack: list[list] = [[]]
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise ValueError(f"bad syntax at {text[pos:pos + 20]!r}")
            break
        pos = m.end()
        if m.group("open"):
            new: list = [("(" if m.group("open") == "(" else "[")]
            stack[-1].append(new)
            stack.append(new)
        elif m.group("close"):
            if len(stack) == 1:
                raise ValueError("unbalanced close")
            stack.pop()
        elif m.group("string") is not None:
            stack[-1].append(("str", m.group("string")[1:-1]))
        else:
            stack[-1].append(("atom", m.group("atom")))
    if len(stack) != 1 or len(stack[0]) != 1:
        raise ValueError("expected exactly one top-level form")
    return stack[0][0]


def _atom_value(tok: tuple) -> Any:
    """Literal value of an atom: number, bool, or bare-word string
    (clj-3df writes `Mabel` for the string constant)."""

    kind, s = tok
    if kind == "str":
        return s
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    if re.fullmatch(r"-?\d+\.\d+", s):
        return float(s)
    if s in ("true", "false"):
        return s == "true"
    return s


def _is_var(tok: Any) -> bool:
    return (
        isinstance(tok, tuple) and tok[0] == "atom" and tok[1].startswith("?")
    )


class _Compiler:
    def __init__(self) -> None:
        self.fresh = 0

    def _fresh_var(self) -> str:
        self.fresh += 1
        return f"?__dl{self.fresh}"

    # -- clauses ---------------------------------------------------------

    def pattern_bindings(self, form: list) -> list:
        """`[e :attr v?]` -> attribute (+constant) bindings."""

        items = form[1:]
        if not (2 <= len(items) <= 3):
            raise ValueError(f"bad pattern arity: {items}")
        e_tok, a_tok = items[0], items[1]
        v_tok = items[2] if len(items) == 3 else None
        if a_tok[0] != "atom" or not a_tok[1].startswith(":"):
            raise ValueError(f"pattern attribute must be a keyword: {a_tok}")
        aid = a_tok[1][1:]

        out: list = []
        if _is_var(e_tok):
            e_var = e_tok[1]
        else:
            e_var = self._fresh_var()
            out.append(ConstantBinding(e_var, _atom_value(e_tok)))
        if v_tok is None:
            v_var = self._fresh_var()
        elif _is_var(v_tok):
            v_var = v_tok[1]
        else:
            v_var = self._fresh_var()
            out.append(ConstantBinding(v_var, _atom_value(v_tok)))
        out.insert(0, AttributeBinding(e_var, aid, v_var))
        return out

    def predicate_binding(self, form: list) -> list:
        """`[(op a b)]` -> predicate (+constant) bindings."""

        inner = form[1]
        op = inner[1][1]
        if op not in _PREDICATES:
            raise ValueError(f"unknown predicate {op}")
        out: list = []
        vars_: list[str] = []
        for tok in inner[2:]:
            if _is_var(tok):
                vars_.append(tok[1])
            else:
                v = self._fresh_var()
                out.append(ConstantBinding(v, _atom_value(tok)))
                vars_.append(v)
        # Datomic `(< ?a ?b)` means a < b; the Hector binding
        # convention is reversed (LT((x, y)) admits y < x,
        # hector.rs:1055-1089), so emit the operands swapped.
        out.insert(
            0, BinaryPredicateBinding(vars_[::-1], _PREDICATES[op])
        )
        return out

    def pattern_plan(self, form: list) -> tuple[Plan, list[str]]:
        """A pattern as a standalone plan (for not/or branches)."""

        items = form[1:]
        e_tok, a_tok = items[0], items[1]
        v_tok = items[2] if len(items) == 3 else None
        aid = a_tok[1][1:]
        if not _is_var(e_tok):
            v_var = v_tok[1] if v_tok is not None and _is_var(v_tok) else self._fresh_var()
            return MatchEA(_atom_value(e_tok), aid, v_var), [v_var]
        if v_tok is not None and not _is_var(v_tok):
            return MatchAV(e_tok[1], aid, _atom_value(v_tok)), [e_tok[1]]
        v_var = v_tok[1] if v_tok is not None else self._fresh_var()
        return MatchA(e_tok[1], aid, v_var), [e_tok[1], v_var]

    # -- :where ----------------------------------------------------------

    def compile_where(
        self, clauses: list, target: list[str]
    ) -> Plan:
        bindings: list = []
        ors: list[list] = []
        nots: list[list] = []
        rules: list[list] = []
        for c in clauses:
            head = c[0]
            if head == "[" and c[1][0] == "(":  # [(op ...)]
                bindings.extend(self.predicate_binding(c))
            elif head == "[":
                bindings.extend(self.pattern_bindings(c))
            elif head == "(" and c[1][1] in ("or", "or-join"):
                ors.append(c)
            elif head == "(" and c[1][1] == "not":
                nots.append(c)
            elif head == "(" and all(_is_var(t) for t in c[2:]):
                # Rule invocation: (rulename ?a ?b ...) — a reference
                # to a registered rule (clj-3df rule application).
                rules.append(c)
            else:
                raise ValueError(f"unsupported clause {c}")

        conj_vars = _binding_vars(bindings)
        plan: Optional[Plan] = None
        if bindings:
            plan = Hector(
                [v for v in conj_vars if not v.startswith("?__dl")], bindings
            )

        from .plans import NameExpr

        for r in rules:
            name = r[1][1]
            rule_vars = [t[1] for t in r[2:]]
            ref: Plan = NameExpr(rule_vars, name)
            if plan is None:
                plan = ref
                conj_vars = list(rule_vars)
            else:
                shared = [v for v in rule_vars if v in conj_vars]
                plan = Join(shared, plan, ref)
                conj_vars += [v for v in rule_vars if v not in conj_vars]

        for o in ors:
            union_plan, union_vars = self.compile_or(o)
            if plan is None:
                plan = union_plan
            else:
                shared = [v for v in union_vars if v in conj_vars]
                plan = Join(shared, plan, union_plan)

        for n in nots:
            sub, sub_vars = self.pattern_plan(n[2])
            keys = [v for v in sub_vars if v in _plan_vars(plan)]
            plan = Antijoin(keys, plan, sub)

        if plan is None:
            raise ValueError("empty :where")
        return plan

    def compile_or(self, form: list) -> tuple[Plan, list[str]]:
        if form[1][1] == "or-join":
            join_vars = [t[1] for t in form[2][1:]]
            branches = form[3:]
        else:
            join_vars = None
            branches = form[2:]
        plans: list[Plan] = []
        vars_: Optional[list[str]] = None
        for b in branches:
            if b[0] == "(" and b[1][1] == "and":
                inner = self.compile_where(b[2:], [])
                p, pv = inner, _plan_vars(inner)
            else:
                p, pv = self.pattern_plan(b)
            pv = [v for v in pv if not v.startswith("?__dl")]
            if join_vars is not None:
                p = Project(join_vars, p)
                pv = join_vars
            if vars_ is None:
                vars_ = pv
            elif set(vars_) != set(pv):
                raise ValueError(
                    "or branches must bind the same variables "
                    f"({vars_} vs {pv}); use or-join"
                )
            plans.append(Project(vars_, p))
        return Union(vars_ or [], plans), vars_ or []


def _binding_vars(bindings: list) -> list[str]:
    out: list[str] = []
    for b in bindings:
        if isinstance(b, AttributeBinding):
            for v in (b.e, b.v):
                if v not in out:
                    out.append(v)
        elif isinstance(b, BinaryPredicateBinding):
            for v in b.variables_:
                if v not in out:
                    out.append(v)
    return out


def _plan_vars(plan: Optional[Plan]) -> list[str]:
    return plan.variables() if plan is not None else []


def parse_query(text: str) -> Plan:
    """Compile a `[:find ... :where ...]` string to a Plan."""

    form = _read(text)
    if form[0] != "[" or form[1] != ("atom", ":find"):
        raise ValueError("query must start with [:find ...]")

    # Split at :with / :where keywords.
    find_elems: list = []
    with_vars: list[str] = []
    where: list = []
    section = "find"
    for item in form[2:]:
        if item == ("atom", ":where"):
            section = "where"
        elif item == ("atom", ":with"):
            section = "with"
        elif section == "find":
            find_elems.append(item)
        elif section == "with":
            with_vars.append(item[1])
        else:
            where.append(item)

    comp = _Compiler()

    keys: list[str] = []
    aggs: list[tuple[AggregationFn, str]] = []
    for el in find_elems:
        if _is_var(el):
            keys.append(el[1])
        elif isinstance(el, list) and el[0] == "(":
            fn = el[1][1]
            if fn not in _AGGREGATES:
                raise ValueError(f"unknown aggregate {fn}")
            aggs.append((_AGGREGATES[fn], el[2][1]))
        else:
            raise ValueError(f"bad :find element {el}")

    target = keys + [v for _, v in aggs]
    inner = comp.compile_where(where, target)

    if aggs:
        return Aggregate(
            target,
            inner,
            [fn for fn, _ in aggs],
            keys,
            [v for _, v in aggs],
            with_variables=with_vars,
        )
    return Project(target, inner)


def query(engine, text: str, names: Optional[list[str]] = None):
    """Parse and run a Datalog query string on an engine."""

    return engine.implement(parse_query(text), names)
