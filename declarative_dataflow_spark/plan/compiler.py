"""Plan -> DataFrame compiler ("implement").

Lowers the logical :mod:`plans` algebra to PySpark DataFrames,
mirroring the reference's per-variant ``Plan::implement`` dispatch
(reference: src/plan/mod.rs:299-421) but targeting Catalyst instead of
timely dataflow.

Weighted-bag semantics: the reference models every collection as a
weighted multiset with ``diff`` multiplicities (src/lib.rs:243). Here a
relation optionally carries a ``__diff`` LONG column; when absent, every
row has implicit weight 1 and the compiled plan is pure Catalyst with no
weight arithmetic — so parquet-backed attributes compile to plain
scans/joins/aggregates that whole-stage codegen handles. The ``__diff``
column only materializes for transacted data with retractions.

Scale notes (100 TB design):
- Attribute scans are column-pruned parquet reads; constants become
  pushed-down filters (Catalyst ``PushedFilters``).
- Hector conjunctions fuse same-entity same-table bindings into ONE
  scan (no self-joins), then chain equi-joins and let Catalyst/AQE
  pick broadcast vs sort-merge and reorder.
- No driver-side collects anywhere in the compile path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

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
    Scan,
    TopK,
    Transform,
    Union,
    Var,
)

DIFF = "__diff"


def _reduced_rational(num: Column, den: Column) -> Column:
    """``num/den`` in lowest terms as ``struct(num, den)`` with a
    positive denominator — the shape of the reference's
    ``Value::Rational32`` (num_rational's ``Ratio::new`` reduces on
    construction; src/lib.rs:96, aggregate_neu.rs:206). The GCD runs
    as a JVM-side higher-order fold: 96 Euclid steps cover any i64
    operand pair (the Fibonacci worst-case bound), each step constant
    work on a 2-field struct. Exactness: the divisions go through
    DECIMAL(38,0) (the quotient is integral by construction), so no
    double rounding even past 2^53."""

    init = F.struct(F.abs(num).alias("x"), F.abs(den).alias("y"))
    g = F.aggregate(
        F.sequence(F.lit(1), F.lit(96)),
        init,
        lambda acc, _i: F.when(acc.getField("y") == 0, acc).otherwise(
            F.struct(
                acc.getField("y").alias("x"),
                (acc.getField("x") % acc.getField("y")).alias("y"),
            )
        ),
        lambda acc: acc.getField("x"),
    )
    # gcd(0, den) = den, so g = 0 only for 0/0 — which AVG/VARIANCE
    # never emit (a group exists only with count > 0); the floor just
    # keeps the division total.
    g = F.when(g == 0, F.lit(1)).otherwise(g)
    s_num = F.when(den < 0, -num).otherwise(num)
    s_den = F.abs(den)
    return F.struct(
        (s_num.cast("decimal(38,0)") / g.cast("decimal(38,0)"))
        .cast("long")
        .alias("num"),
        (s_den.cast("decimal(38,0)") / g.cast("decimal(38,0)"))
        .cast("long")
        .alias("den"),
    )


def vcol(var: Var) -> str:
    """Column name for a query variable."""

    return f"_v_{var}"


@dataclass
class Relation:
    """A compiled relation: DataFrame + variable binding order.

    ``has_diff`` mirrors whether ``__diff`` is materialized; absent
    means implicit weight 1 (pure-Catalyst fast path).
    """

    variables: list[Var]
    df: DataFrame
    has_diff: bool = False

    def col(self, var: Var) -> Column:
        return self.df[vcol(var)]

    def with_diff(self) -> "Relation":
        if self.has_diff:
            return self
        return Relation(
            self.variables, self.df.withColumn(DIFF, F.lit(1).cast("long")), True
        )

    def projected(self, variables: list[Var]) -> "Relation":
        cols = [vcol(v) for v in variables]
        if self.has_diff:
            cols.append(DIFF)
        return Relation(list(variables), self.df.select(*cols), self.has_diff)

    def consolidated(self) -> "Relation":
        """Merge diffs at equal tuples, drop zero-weight tuples
        (reference: consolidate, src/lib.rs:1016)."""

        if not self.has_diff:
            return self
        cols = [vcol(v) for v in self.variables]
        df = (
            self.df.groupBy(*cols)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        return Relation(list(self.variables), df, True)

    def distinct(self) -> "Relation":
        """Set semantics: keep tuples with positive net weight at weight 1."""

        cols = [vcol(v) for v in self.variables]
        if not self.has_diff:
            return Relation(list(self.variables), self.df.dropDuplicates(cols), False)
        df = (
            self.df.groupBy(*cols)
            .agg(F.sum(DIFF).alias("__w"))
            .filter(F.col("__w") > 0)
            .drop("__w")
        )
        return Relation(list(self.variables), df, False)


class AttributeSource:
    """Catalog entry for one attribute: a lazily-built (e, v[, t, diff])
    DataFrame, optionally carrying base-table lineage for scan fusion."""

    def __init__(
        self,
        loader: Callable[[], DataFrame],
        has_diff: bool = False,
        table: Optional[str] = None,
        e_expr: Optional[str] = None,
        v_expr: Optional[str] = None,
        table_loader: Optional[Callable[[], DataFrame]] = None,
        distinct: bool = False,
    ):
        self.loader = loader
        self.has_diff = has_diff
        # Fusion lineage: attribute == SELECT e_expr AS e, v_expr AS v
        # FROM table WHERE v_expr IS NOT NULL.
        self.table = table
        self.e_expr = e_expr
        self.v_expr = v_expr
        self.table_loader = table_loader
        # Declared set semantics: (e, v) pairs are duplicate-free, so
        # set-based strategies (WCO adjacency intersection) preserve
        # multiplicities exactly.
        self.distinct = distinct

    @property
    def fusable(self) -> bool:
        return self.table is not None

    def dataframe(self) -> DataFrame:
        return self.loader()


class UnboundRule(Exception):
    """Raised when a NameExpr references a recursion variable that has
    no iterate yet (iteration 0 of the fixpoint). Union treats such a
    branch as empty — the Datalog base case."""

    def __init__(self, name: str):
        super().__init__(name)
        self.name = name


class Catalog:
    """Resolves attribute names and rule names during compilation."""

    def __init__(
        self,
        attributes: dict[str, AttributeSource],
        rules: Optional[dict[str, Plan]] = None,
        bound_rules: Optional[dict[str, Relation]] = None,
        unbound: Optional[set[str]] = None,
    ):
        self.attributes = attributes
        self.rules = rules or {}
        # Materialized relations for rules (used by the recursion
        # fixpoint to close NameExpr over the previous iteration).
        self.bound_rules = bound_rules or {}
        # Recursive rules with no iterate yet (fixpoint iteration 0).
        self.unbound = unbound or set()
        # Base tables for Scan leaves: name -> loader.
        self.tables: dict[str, Callable[[], DataFrame]] = {}
        # Fixpoint static-subtree cache (the arrangement analog): the
        # differential reference arranges static collections ONCE and
        # every iteration reuses the arrangement (src/lib.rs:943-1019);
        # here a fixpoint shares this dict across iterations so each
        # maximal static subtree compiles and checkpoints once instead
        # of re-scanning its parquet inputs per iteration. ``None``
        # disables caching (the default outside recursion).
        self.static_cache: Optional[dict[str, Relation]] = None
        # Rule names whose results change across fixpoint iterations
        # (the recursive rules plus anything transitively referencing
        # them); subtrees touching these are never cached.
        self.dynamic_rules: set[str] = set()
        # Set by MONOTONE fixpoints only: the dynamic region above a
        # static subtree is then join/filter/union/project — all
        # set-preserving — and every iterate is distinct-ed, so the
        # cached output may consolidate (weighted) or dedup (weight-1)
        # without changing the fixpoint. Non-monotone (naive) loops
        # leave this False: a dynamic Aggregate over the static output
        # would see changed multiplicities.
        self.static_dedup: bool = False

    def attribute(self, aid: str) -> AttributeSource:
        if aid not in self.attributes:
            raise KeyError(f"unknown attribute: {aid}")
        return self.attributes[aid]

    def table(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(f"unknown table: {name}")
        return self.tables[name]()


def _rule_refs(plan: Plan) -> set[str]:
    """All rule names referenced (transitively through the plan tree,
    not through the rule catalog) by ``plan``."""

    refs: set[str] = set()
    stack: list[Plan] = [plan]
    while stack:
        p = stack.pop()
        if isinstance(p, NameExpr):
            refs.add(p.name)
        for attr in getattr(p, "__dataclass_fields__", {}):
            v = getattr(p, attr)
            if isinstance(v, Plan):
                stack.append(v)
            elif isinstance(v, list):
                stack.extend(item for item in v if isinstance(item, Plan))
    return refs


def compile_plan(plan: Plan, catalog: Catalog) -> Relation:
    """Compile a plan bottom-up (reference: Plan::implement dispatch,
    src/plan/mod.rs:299-421).

    When ``catalog.static_cache`` is set (fixpoint compilation), any
    maximal subtree that references no dynamic rule compiles once and
    is lazily ``localCheckpoint``-ed; later iterations reuse the
    materialized blocks instead of re-scanning the inputs — the Spark
    analog of differential dataflow's shared arrangements for static
    collections inside an iterative scope.
    """

    cache = catalog.static_cache
    if cache is not None:
        key = repr(plan)
        hit = cache.get(key)
        if hit is not None:
            return hit
        if not (_rule_refs(plan) & catalog.dynamic_rules):
            # Compile the whole static subtree with caching off so
            # nested static nodes don't each checkpoint; only the
            # maximal subtree materializes.
            catalog.static_cache = None
            try:
                rel = compile_plan(plan, catalog)
            finally:
                catalog.static_cache = cache
            if catalog.static_dedup:
                rel = (
                    rel.consolidated()
                    if rel.has_diff
                    else Relation(
                        rel.variables, rel.df.dropDuplicates(), False
                    )
                )
            ckpt = rel.df.localCheckpoint(eager=False)
            rel = Relation(rel.variables, ckpt, rel.has_diff)
            cache[key] = rel
            return rel

    if isinstance(plan, Scan):
        # Keys may be plain column names or SQL expressions.
        df = catalog.table(plan.table)
        # Raw-column date predicates mirrored down by the pushdown
        # prepass (see push_scan_date_filters): applied BEFORE the
        # select so the parquet scan sees bare-column comparisons it
        # can turn into PushedFilters / row-group skipping. Exactly
        # redundant with the Filter nodes above — the row multiset is
        # unchanged.
        for kind, col, pred, lit in getattr(plan, "pushed", ()):
            df = df.filter(_raw_date_pred(kind, col, pred, lit))
        cols = [F.expr(c).alias(vcol(v)) for c, v in plan.columns.items()]
        return Relation(list(plan.columns.values()), df.select(*cols), False)
    if isinstance(plan, MatchA):
        return _match_a(plan, catalog)
    if isinstance(plan, MatchEA):
        return _match_ea(plan, catalog)
    if isinstance(plan, MatchAV):
        return _match_av(plan, catalog)
    if isinstance(plan, Project):
        return compile_plan(plan.plan, catalog).projected(plan.variables_)
    if isinstance(plan, Join):
        return _join(plan, catalog)
    if isinstance(plan, Antijoin):
        return _antijoin(plan, catalog)
    if isinstance(plan, Negate):
        rel = compile_plan(plan.plan, catalog).with_diff()
        return Relation(rel.variables, rel.df.withColumn(DIFF, -F.col(DIFF)), True)
    if isinstance(plan, Union):
        return _union(plan, catalog)
    if isinstance(plan, Filter):
        return _filter(plan, catalog)
    if isinstance(plan, Transform):
        return _transform(plan, catalog)
    if isinstance(plan, Aggregate):
        return _aggregate(plan, catalog)
    if isinstance(plan, NameExpr):
        return _name_expr(plan, catalog)
    if isinstance(plan, Hector):
        return _hector(plan, catalog)
    if isinstance(plan, PullLevel):
        return _pull_level(plan, catalog)
    if isinstance(plan, Pull):
        return _pull(plan, catalog)
    if isinstance(plan, PullAll):
        return _pull_all(plan, catalog)
    if isinstance(plan, TopK):
        return _topk(plan, catalog)
    raise TypeError(f"unsupported plan node: {type(plan).__name__}")


# ---------------------------------------------------------------------------
# Leaves
# ---------------------------------------------------------------------------


def _attr_rel(catalog: Catalog, aid: str, e: Var, v: Var) -> Relation:
    src = catalog.attribute(aid)
    df = src.dataframe()
    if e == v:
        # Self-referential pattern [?a :attr ?a]: keep rows where the
        # entity equals its value, bind the variable once.
        df = df.filter(df["e"] == df["v"])
        cols = [df["e"].alias(vcol(e))]
        if src.has_diff:
            cols.append(df["diff"].alias(DIFF))
        return Relation([e], df.select(*cols), src.has_diff)
    cols = [df["e"].alias(vcol(e)), df["v"].alias(vcol(v))]
    if src.has_diff:
        cols.append(df["diff"].alias(DIFF))
    return Relation([e, v], df.select(*cols), src.has_diff)


def _match_a(plan: MatchA, catalog: Catalog) -> Relation:
    return _attr_rel(catalog, plan.attribute, plan.e, plan.v)


def _match_ea(plan: MatchEA, catalog: Catalog) -> Relation:
    src = catalog.attribute(plan.attribute)
    df = src.dataframe().filter(F.col("e") == F.lit(plan.entity))
    cols = [df["v"].alias(vcol(plan.v))]
    if src.has_diff:
        cols.append(df["diff"].alias(DIFF))
    return Relation([plan.v], df.select(*cols), src.has_diff)


def _match_av(plan: MatchAV, catalog: Catalog) -> Relation:
    src = catalog.attribute(plan.attribute)
    df = src.dataframe().filter(F.col("v") == F.lit(plan.value))
    cols = [df["e"].alias(vcol(plan.e))]
    if src.has_diff:
        cols.append(df["diff"].alias(DIFF))
    return Relation([plan.e], df.select(*cols), src.has_diff)


# ---------------------------------------------------------------------------
# Binary operators
# ---------------------------------------------------------------------------


def _join_rel(left: Relation, right: Relation, key: list[Var]) -> Relation:
    """Equijoin; output order key ++ left-rest ++ right-rest
    (reference tuple layout: src/plan/join.rs:26-33)."""

    rest_l = [v for v in left.variables if v not in key]
    rest_r = [v for v in right.variables if v not in key]
    has_diff = left.has_diff or right.has_diff

    ldf, rdf = left.df, right.df
    if has_diff:
        ldf = left.with_diff().df.withColumnRenamed(DIFF, "__diff_l")
        rdf = right.with_diff().df.withColumnRenamed(DIFF, "__diff_r")
    # Rename right key columns to avoid ambiguity, join on equality.
    for kv in key:
        rdf = rdf.withColumnRenamed(vcol(kv), f"__rk_{vcol(kv)}")
    cond = [ldf[vcol(kv)] == rdf[f"__rk_{vcol(kv)}"] for kv in key]
    joined = ldf.join(rdf, on=cond, how="inner") if key else ldf.crossJoin(rdf)

    out_vars = key + rest_l + rest_r
    cols = [F.col(vcol(v)) for v in out_vars]
    if has_diff:
        cols.append((F.col("__diff_l") * F.col("__diff_r")).alias(DIFF))
    return Relation(out_vars, joined.select(*cols), has_diff)


def _join(plan: Join, catalog: Catalog) -> Relation:
    left = compile_plan(plan.left_plan, catalog)
    right = compile_plan(plan.right_plan, catalog)
    return _join_rel(left, right, list(plan.variables_))


def _antijoin(plan: Antijoin, catalog: Catalog) -> Relation:
    """Set-semantics antijoin (reference distincts both sides,
    src/plan/antijoin.rs:95-97).

    An unbound recursion variable on the RIGHT side is the empty set —
    negating nothing passes the left through (iteration 0 of an
    alternating fixpoint, e.g. win(x) :- move(x,y), not win(y))."""

    left = compile_plan(plan.left_plan, catalog).distinct()
    try:
        right_rel = compile_plan(plan.right_plan, catalog)
    except UnboundRule:
        return left
    right = (
        right_rel
        .projected(plan.variables_)  # key projection
        .distinct()
    )
    rdf = right.df
    for kv in plan.variables_:
        rdf = rdf.withColumnRenamed(vcol(kv), f"__rk_{vcol(kv)}")
    cond = [left.df[vcol(kv)] == rdf[f"__rk_{vcol(kv)}"] for kv in plan.variables_]
    out = left.df.join(rdf, on=cond, how="left_anti")
    return Relation(left.variables, out, False)


def _union(plan: Union, catalog: Catalog) -> Relation:
    """Concatenate then distinct (reference: src/plan/union.rs:73-77).

    Branches referencing an unbound recursion variable are dropped —
    this is how fixpoint iteration 0 reduces to the base case.
    """

    rels = []
    for p in plan.plans:
        try:
            rels.append(compile_plan(p, catalog).projected(plan.variables_))
        except UnboundRule:
            continue
    if not rels:
        raise UnboundRule(str(plan.variables_))
    has_diff = any(r.has_diff for r in rels)
    if has_diff:
        rels = [r.with_diff() for r in rels]
    df = rels[0].df
    for r in rels[1:]:
        df = df.unionByName(r.df)
    return Relation(list(plan.variables_), df, has_diff).distinct()


# ---------------------------------------------------------------------------
# Filter / Transform
# ---------------------------------------------------------------------------

_PREDICATES: dict[Predicate, Callable[[Column, Column], Column]] = {
    Predicate.LT: lambda a, b: a < b,
    Predicate.GT: lambda a, b: a > b,
    Predicate.LTE: lambda a, b: a <= b,
    Predicate.GTE: lambda a, b: a >= b,
    Predicate.EQ: lambda a, b: a == b,
    Predicate.NEQ: lambda a, b: a != b,
}


def _operands(
    variables: list[Var], constants: dict[int, Any], df_cols: Callable[[Var], Column]
) -> list[Column]:
    """Positional operands: constants override variables at their index
    (reference Filter/Transform constants, src/plan/filter.rs:45-55)."""

    ops: list[Column] = []
    n = len(variables) + len(constants)
    vi = 0
    for i in range(n):
        if i in constants:
            ops.append(F.lit(constants[i]))
        else:
            ops.append(df_cols(variables[vi]))
            vi += 1
    return ops


def _filter(plan: Filter, catalog: Catalog) -> Relation:
    rel = compile_plan(plan.plan, catalog)
    ops = _operands(plan.variables_, plan.constants, lambda v: F.col(vcol(v)))
    pred = _PREDICATES[plan.predicate](ops[0], ops[1])
    return Relation(rel.variables, rel.df.filter(pred), rel.has_diff)


# ---------------------------------------------------------------------------
# Date-predicate scan pushdown (guide §6: PushedFilters must reach the
# parquet scan). The DSL's binding model filters VARIABLES, and date
# variables bind DERIVED scan expressions — epoch-us via
# timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', col) or
# year(col) — so the range predicates evaluate post-decode in the scan
# stage and never reach PushedFilters / parquet row-group statistics.
# This prepass walks each plan once; for every Filter-vs-constant over a
# variable that a chain of Filters below binds via one of those two
# shapes, it mirrors an EXACTLY EQUIVALENT raw-column predicate into the
# Scan leaf (Scan.pushed). The original Filter stays — the added
# conjunct is redundant, so the row multiset is provably unchanged:
#   timestampdiff(us, epoch, c) CMP k  <=>  c CMP (epoch + k us)
#     (both sides integral microseconds; the map is a strictly
#      monotone bijection, so every CMP carries over, EQ/NEQ included)
#   year(c) = y   <=> ts(y-01-01) <= c < ts(y+1-01-01)
#   year(c) >= y  <=> c >= ts(y-01-01)       (and dually for <=, <, >)
# ---------------------------------------------------------------------------

import datetime as _dt
import re as _re

_EPOCH_BIND_RE = _re.compile(
    r"^timestampdiff\(\s*MICROSECOND\s*,\s*TIMESTAMP_NTZ\s*"
    r"'1970-01-01(?: 00:00:00)?'\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
)
_YEAR_BIND_RE = _re.compile(r"^year\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")

# Predicate seen from the VARIABLE side when the constant sits at
# position 0 (const CMP var  <=>  var FLIP(CMP) const).
_FLIP = {
    Predicate.LT: Predicate.GT,
    Predicate.GT: Predicate.LT,
    Predicate.LTE: Predicate.GTE,
    Predicate.GTE: Predicate.LTE,
    Predicate.EQ: Predicate.EQ,
    Predicate.NEQ: Predicate.NEQ,
}

_MAX_EPOCH_US = 253_402_300_799_999_999  # 9999-12-31, datetime's ceiling


def _ntz_lit(us: int) -> Column:
    ts = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
    return F.expr(f"TIMESTAMP_NTZ '{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'")


def _raw_date_pred(kind: str, col: str, pred: Predicate, lit: int) -> Column:
    c = F.col(col)
    if kind == "epoch_us":
        t = _ntz_lit(lit)
        return {
            Predicate.LT: c < t,
            Predicate.GT: c > t,
            Predicate.LTE: c <= t,
            Predicate.GTE: c >= t,
            Predicate.EQ: c == t,
            Predicate.NEQ: c != t,
        }[pred]
    # kind == "year": year boundaries as NTZ timestamps
    lo = F.expr(f"TIMESTAMP_NTZ '{lit:04d}-01-01 00:00:00'")
    hi = F.expr(f"TIMESTAMP_NTZ '{lit + 1:04d}-01-01 00:00:00'")
    return {
        Predicate.EQ: (c >= lo) & (c < hi),
        Predicate.GTE: c >= lo,
        Predicate.GT: c >= hi,
        Predicate.LTE: c < hi,
        Predicate.LT: c < lo,
    }[pred]


def _pushable(kind: str, pred: Predicate, lit: Any) -> bool:
    if isinstance(lit, bool) or not isinstance(lit, int):
        return False
    if kind == "epoch_us":
        return 0 <= lit <= _MAX_EPOCH_US
    return pred != Predicate.NEQ and 1 <= lit <= 9998


def _push_into_scans(plan: Plan, var: Var, pred: Predicate, lit: int) -> Plan:
    """Mirror ``var PRED lit`` into the Scan leaf(s) reachable from
    ``plan`` through Filter nodes only, when the Scan binds ``var`` via
    a recognized derived-date expression. Returns a rebuilt plan (new
    nodes; inputs are never mutated) or the original when nothing
    matched. Descending through Filters only is conservative and
    sufficient: the TPC-H shapes are Filter chains over Scan, and a
    Filter between the predicate and the Scan commutes with the added
    conjunct."""

    if isinstance(plan, Filter):
        child = _push_into_scans(plan.plan, var, pred, lit)
        if child is plan.plan:
            return plan
        return Filter(plan.variables_, plan.predicate, child, plan.constants)
    if isinstance(plan, Scan):
        for expr, v in plan.columns.items():
            if v != var:
                continue
            m = _EPOCH_BIND_RE.match(expr.strip())
            kind = "epoch_us" if m else "year"
            if m is None:
                m = _YEAR_BIND_RE.match(expr.strip())
            if m is None or not _pushable(kind, pred, lit):
                return plan
            entry = (kind, m.group(1), pred, lit)
            if entry in plan.pushed:
                return plan
            return Scan(plan.table, plan.columns, plan.pushed + (entry,))
    return plan


def push_scan_date_filters(plan: Plan) -> Plan:
    """The prepass entry point: rebuild ``plan`` with every
    constant-vs-derived-date Filter mirrored into its Scan leaf as a
    raw-column predicate (see the block comment above). Structurally
    a no-op for plans without such Filters."""

    import dataclasses

    if isinstance(plan, Filter) and len(plan.variables_) == 1 and len(
        plan.constants
    ) == 1:
        pos, lit = next(iter(plan.constants.items()))
        pred = plan.predicate if pos == 1 else _FLIP[plan.predicate]
        child = push_scan_date_filters(plan.plan)
        child = _push_into_scans(child, plan.variables_[0], pred, lit)
        if child is plan.plan:
            return plan
        return Filter(plan.variables_, plan.predicate, child, plan.constants)

    changed = False
    updates: dict[str, Any] = {}
    for f in dataclasses.fields(plan):
        val = getattr(plan, f.name)
        if isinstance(val, Plan):
            new = push_scan_date_filters(val)
            if new is not val:
                updates[f.name] = new
                changed = True
        elif isinstance(val, list) and val and isinstance(val[0], Plan):
            news = [push_scan_date_filters(p) for p in val]
            if any(n is not o for n, o in zip(news, val)):
                updates[f.name] = news
                changed = True
    if not changed:
        return plan
    return dataclasses.replace(plan, **updates)


_TRUNCATE_BUCKETS = {
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    ":minute": "minute",
    ":hour": "hour",
    ":day": "day",
    ":week": "week",
}


def _transform(plan: Transform, catalog: Catalog) -> Relation:
    """Scalar functions (reference: src/plan/transform.rs:86-192)."""

    rel = compile_plan(plan.plan, catalog)
    out = vcol(plan.result_variable)
    if plan.function == Function.TRUNCATE:
        src = F.col(vcol(plan.variables_[0]))
        bucket = plan.constants.get(1, plan.constants.get(0, "hour"))
        if isinstance(bucket, str):
            df = rel.df.withColumn(out, F.date_trunc(_TRUNCATE_BUCKETS[bucket], src))
        else:
            # Numeric epoch-ms truncation: v - v % bucket
            # (reference: src/plan/transform.rs:100-106).
            df = rel.df.withColumn(out, src - (src % F.lit(bucket)))
    elif plan.function in (Function.ADD, Function.SUBTRACT):
        ops = _operands(plan.variables_, plan.constants, lambda v: F.col(vcol(v)))
        acc = ops[0]
        for op in ops[1:]:
            acc = acc + op if plan.function == Function.ADD else acc - op
        df = rel.df.withColumn(out, acc)
    else:  # pragma: no cover
        raise ValueError(f"unsupported transform function {plan.function}")
    return Relation(rel.variables + [plan.result_variable], df, rel.has_diff)


# ---------------------------------------------------------------------------
# Aggregation (reference: src/plan/aggregate_neu.rs)
# ---------------------------------------------------------------------------


def _aggregate(plan: Aggregate, catalog: Catalog) -> Relation:
    rel = compile_plan(plan.plan, catalog)
    keys = list(plan.key_variables)
    key_cols = [vcol(k) for k in keys]

    # Keep :with variables through the pre-aggregation projection so
    # duplicate contributions stay distinct (reference:
    # aggregate_neu.rs:128-143), then drop them by aggregating over keys.
    carry = keys + [
        v for v in plan.with_variables if v not in keys
    ] + [v for v in plan.aggregation_variables if v not in keys]
    seen: list[Var] = []
    for v in carry:
        if v not in seen:
            seen.append(v)
    rel = rel.projected(seen)

    # Consolidate diff-carrying input first: the reference's differential
    # reduce only ever sees the consolidated multiset
    # (aggregate_neu.rs reduce), so a value asserted then retracted
    # (+1/-1 rows) must not reach MIN/MAX/MEDIAN. Linear aggregates
    # (COUNT/SUM/AVG/VARIANCE) are unaffected — summing v*net over
    # consolidated rows equals summing v*diff over raw rows — while the
    # order statistics below additionally guard net weight > 0.
    if rel.has_diff:
        rel = rel.consolidated()

    diff = F.col(DIFF) if rel.has_diff else F.lit(1)

    aggs: list[Column] = []
    medians: list[tuple[Var, str]] = []
    for fn, av in zip(plan.aggregation_fns, plan.aggregation_variables):
        c = F.col(vcol(av))
        # Order statistics ignore tuples with non-positive net weight.
        present = F.when(F.col(DIFF) > 0, c) if rel.has_diff else c
        out = vcol(av)
        if fn == AggregationFn.MIN:
            aggs.append(F.min(present).alias(out))
        elif fn == AggregationFn.MAX:
            aggs.append(F.max(present).alias(out))
        elif fn == AggregationFn.COUNT:
            cnt = F.sum(diff)
            if not key_cols:
                # Global count over an empty relation: SQL count(*)
                # yields 0 where sum(diff) yields NULL; grouped counts
                # are unaffected (empty groups emit no row at all).
                cnt = F.coalesce(cnt, F.lit(0).cast("long"))
            aggs.append(cnt.alias(out))
        elif fn == AggregationFn.SUM:
            aggs.append(F.sum(c * diff).alias(out))
        elif fn == AggregationFn.AVG:
            if plan.exact == "rational":
                # Full wire parity with the reference's
                # Value::Rational32(Ratio::new(sum, count))
                # (aggregate_neu.rs:206): a REDUCED (num, den) struct
                # a wire client can serialize as {"Rational32":
                # [num, den]} bit-for-bit (Ratio::new reduces, so
                # 20/2 ships as [10, 1]).
                s = F.sum(c.cast("long") * diff)
                n = F.sum(diff)
                aggs.append(_reduced_rational(s, n).alias(out))
            elif plan.exact:
                # Exact-rational stand-in for the reference's Rational32
                # result (aggregate_neu.rs:206). The reference aggregates
                # Value::Number(i64), so the sum is integral:
                # decimal(19,0) / decimal(18,0) yields decimal(38,19) —
                # no precision-loss scale reduction — truncated to 18
                # fractional digits (vs ~15 significant for double).
                s = F.sum(c.cast("decimal(19,0)") * diff).cast("decimal(19,0)")
                n = F.sum(diff).cast("decimal(18,0)")
                aggs.append((s / n).cast("decimal(38,18)").alias(out))
            else:
                aggs.append((F.sum(c * diff) / F.sum(diff)).alias(out))
        elif fn == AggregationFn.VARIANCE:
            # sumsq/c - (sum/c)^2 (reference: aggregate_neu.rs:214-243)
            if plan.exact == "rational":
                # Reduced (n*sumsq - s^2) / n^2 — identical to the
                # reference's Ratio arithmetic (Ratio auto-reduces
                # after subtraction, aggregate_neu.rs:237-238).
                cl = c.cast("long")
                sumsq = F.sum(cl * cl * diff)
                s = F.sum(cl * diff)
                n = F.sum(diff)
                aggs.append(
                    _reduced_rational(n * sumsq - s * s, n * n).alias(out)
                )
            elif plan.exact:
                # Single exact division: (n*sumsq - s^2) / n^2 with an
                # integral numerator (integer inputs), same decimal
                # shape as exact AVG. Overflows past 19 digits return
                # NULL — far beyond the reference's i32 rational range.
                cd = c.cast("decimal(19,0)")
                sumsq = F.sum(cd * cd * diff)
                s = F.sum(cd * diff)
                n = F.sum(diff)
                num = (n * sumsq - s * s).cast("decimal(19,0)")
                den = (n * n).cast("decimal(18,0)")
                aggs.append((num / den).cast("decimal(38,18)").alias(out))
            else:
                sumsq = F.sum(c * c * diff)
                s = F.sum(c * diff)
                n = F.sum(diff)
                aggs.append((sumsq / n - (s / n) * (s / n)).alias(out))
        elif fn == AggregationFn.STDDEV:
            # sqrt(population variance). The reference stubs STDDEV out
            # (aggregate_neu.rs:37-38) because Rational32 cannot hold a
            # square root; the result here is double even under
            # exact=True (the radicand is computed exactly first).
            if plan.exact:
                cd = c.cast("decimal(19,0)")
                sumsq = F.sum(cd * cd * diff)
                s = F.sum(cd * diff)
                n = F.sum(diff)
                num = (n * sumsq - s * s).cast("decimal(19,0)")
                den = (n * n).cast("decimal(18,0)")
                aggs.append(
                    F.sqrt((num / den).cast("double")).alias(out)
                )
            else:
                sumsq = F.sum(c * c * diff)
                s = F.sum(c * diff)
                n = F.sum(diff)
                aggs.append(
                    F.sqrt(sumsq / n - (s / n) * (s / n)).alias(out)
                )
        elif fn == AggregationFn.MEDIAN:
            medians.append((av, out))
        else:  # pragma: no cover
            raise ValueError(f"unsupported aggregation {fn}")

    if plan.grouping is not None and medians:
        # MEDIAN is windowed (exact upper-middle element), not a
        # foldable aggregate — it has no subtotal semantics.
        raise ValueError("MEDIAN is incompatible with rollup/cube")
    pieces: list[DataFrame] = []
    if aggs:
        if plan.grouping is None:
            grouped = rel.df.groupBy(*key_cols)
        elif plan.grouping == "rollup":
            # Beyond-reference: sub/grand-total groups (SQL ROLLUP);
            # subtotal rows carry NULL keys. One pass — Spark expands
            # grouping sets without rescanning the input.
            grouped = rel.df.rollup(*key_cols)
        elif plan.grouping == "cube":
            grouped = rel.df.cube(*key_cols)
        else:
            raise ValueError(f"unknown grouping {plan.grouping!r}")
        pieces.append(grouped.agg(*aggs))
    for av, out in medians:
        pieces.append(_median(rel, keys, av, out))

    df = pieces[0]
    for p in pieces[1:]:
        df = df.join(p, on=key_cols, how="inner") if key_cols else df.crossJoin(p)

    # The reference supports interleaved find clauses like
    # [:find ?key1 (min ?v1) ?key2] via output_offsets
    # (aggregate_neu.rs:110-120): honor the plan's declared variable
    # order whenever it covers exactly the produced columns.
    produced = keys + list(plan.aggregation_variables)
    declared = list(plan.variables_)
    out_vars = declared if sorted(declared) == sorted(produced) else produced
    df = df.select(*[vcol(v) for v in out_vars])
    return Relation(out_vars, df, False)


def _median(rel: Relation, keys: list[Var], av: Var, out: str) -> DataFrame:
    """Exact median, upper-middle element without interpolation
    (reference picks vals[len/2], aggregate_neu.rs:160-166).

    Implemented as a windowed row_number select: one sort per group.
    Weighted rows are expanded via sequence-explode (only happens for
    transacted diff-carrying data, never the parquet fast path).
    """

    df = rel.df
    c = vcol(av)
    if rel.has_diff:
        # Guard diff > 0 before expanding: Spark's sequence(1, n) is
        # DESCENDING for n < 1, so an over-retracted tuple (negative
        # net weight) would expand instead of disappearing.
        df = (
            df.filter(F.col(DIFF) > 0)
            .withColumn("__rep", F.explode(F.sequence(F.lit(1), F.col(DIFF))))
            .drop("__rep", DIFF)
        )
    key_cols = [vcol(k) for k in keys]
    w = Window.partitionBy(*key_cols).orderBy(F.col(c))
    wc = Window.partitionBy(*key_cols)
    ranked = df.select(*key_cols, c).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count(F.lit(1)).over(wc))
    return (
        ranked.filter(F.col("__rn") == F.floor(F.col("__n") / 2) + 1)
        .select(*key_cols, F.col(c).alias(out))
    )


# ---------------------------------------------------------------------------
# NameExpr (rules / recursion handles)
# ---------------------------------------------------------------------------


def _name_expr(plan: NameExpr, catalog: Catalog) -> Relation:
    """Resolve a rule reference (reference: src/plan/mod.rs:402-414).

    Bound rules (recursion variables, materialized iterates) take
    precedence; otherwise the rule's plan is inlined.
    """

    if plan.name in catalog.bound_rules:
        base = catalog.bound_rules[plan.name]
    elif plan.name in catalog.unbound:
        raise UnboundRule(plan.name)
    elif plan.name in catalog.rules:
        # Cycle guard: a recursive rule reached outside a fixpoint
        # (i.e. via Engine.implement on an ad-hoc plan) would inline
        # forever — fail with direction instead of a RecursionError.
        in_flight = getattr(catalog, "_inlining", None)
        if in_flight is None:
            in_flight = catalog._inlining = set()
        if plan.name in in_flight:
            raise RecursionError(
                f"rule {plan.name!r} is recursive; evaluate it via "
                "Engine.interest (driver-side fixpoint), not by "
                "inlining into an ad-hoc plan"
            )
        in_flight.add(plan.name)
        try:
            base = compile_plan(catalog.rules[plan.name], catalog)
        finally:
            in_flight.discard(plan.name)
    else:
        raise KeyError(f"unknown rule: {plan.name}")
    if len(base.variables) != len(plan.variables_):
        raise ValueError(
            f"rule {plan.name} has arity {len(base.variables)}, "
            f"NameExpr asked for {len(plan.variables_)}"
        )
    mapping = dict(zip(base.variables, plan.variables_))
    cols = [F.col(vcol(b)).alias(vcol(mapping[b])) for b in base.variables]
    if base.has_diff:
        cols.append(F.col(DIFF))
    return Relation(list(plan.variables_), base.df.select(*cols), base.has_diff)


# ---------------------------------------------------------------------------
# Hector: n-way conjunction with scan fusion
# ---------------------------------------------------------------------------


def _hector(plan: Hector, catalog: Catalog) -> Relation:
    """Compile a conjunction of bindings to a Catalyst join chain.

    The reference implements this as a worst-case-optimal delta join
    (src/plan/hector.rs:497-927). Spark-first replacement:

    1. constant bindings push into the scans as filters (the reference
       does the same at pipeline start, hector.rs:584-632);
    2. attribute bindings over the SAME entity variable and SAME base
       table fuse into one column-pruned scan — no self-joins;
    3. remaining relations chain-equijoin on shared variables, letting
       Catalyst/AQE reorder and choose broadcast;
    4. binary predicates apply as soon as their variables are bound
       (Catalyst pushes them further down);
    5. antijoin bindings apply last as left_anti.
    """

    attrs = [b for b in plan.bindings if isinstance(b, AttributeBinding)]
    consts = {b.variable: b.value for b in plan.bindings if isinstance(b, ConstantBinding)}
    preds = [b for b in plan.bindings if isinstance(b, BinaryPredicateBinding)]
    antis = [b for b in plan.bindings if isinstance(b, AntijoinBinding)]

    if not attrs:
        raise ValueError("Hector requires at least one attribute binding")

    # --- worst-case-optimal path for cyclic conjunctions ---
    if _wco_eligible(attrs, consts, catalog):
        return _hector_wco(plan, catalog, attrs, consts, preds, antis)

    # --- group fusable bindings by (entity var, base table) ---
    groups: dict[tuple[Var, str], list[AttributeBinding]] = {}
    singles: list[AttributeBinding] = []
    for b in attrs:
        src = catalog.attribute(b.attribute)
        if src.fusable and b.e not in consts:
            groups.setdefault((b.e, src.table), []).append(b)
        else:
            singles.append(b)

    rels: list[Relation] = []
    for (evar, _table), bs in groups.items():
        rels.append(_fused_scan(catalog, evar, bs, consts))
    for b in singles:
        rel = _attr_rel(catalog, b.attribute, b.e, b.v)
        for var in (b.e, b.v):
            if var in consts:
                rel = Relation(
                    rel.variables,
                    rel.df.filter(F.col(vcol(var)) == F.lit(consts[var])),
                    rel.has_diff,
                )
        rels.append(rel)

    # --- chain joins on shared variables ---
    acc = rels[0]
    remaining = rels[1:]
    applied_preds: set[int] = set()
    while remaining:
        idx = next(
            (
                i
                for i, r in enumerate(remaining)
                if set(r.variables) & set(acc.variables)
            ),
            0,
        )
        nxt = remaining.pop(idx)
        key = [v for v in acc.variables if v in nxt.variables]
        acc = _join_rel(acc, nxt, key)
        acc = _apply_ready_predicates(acc, preds, consts, applied_preds)
    acc = _apply_ready_predicates(acc, preds, consts, applied_preds)
    if len(applied_preds) != len(preds):
        raise ValueError("predicate references unbound variable")

    # --- antijoin bindings ---
    for b in antis:
        acc = _apply_antijoin(acc, b, catalog, consts)

    # --- project to target variables; constants may introduce columns ---
    missing = [v for v in plan.variables_ if v not in acc.variables]
    df = acc.df
    for v in missing:
        if v not in consts:
            raise ValueError(f"target variable {v} is unbound")
        df = df.withColumn(vcol(v), F.lit(consts[v]))
        acc = Relation(acc.variables + [v], df, acc.has_diff)
    return acc.projected(plan.variables_)


def _wco_eligible(
    attrs: list[AttributeBinding],
    consts: dict[Var, Any],
    catalog: Catalog,
) -> bool:
    """Route a conjunction to the worst-case-optimal lowering when its
    variable graph is cyclic (the class binary join chains blow up on:
    triangles, k-cycles — reference: src/plan/hector.rs delta
    pipelines) and every source declares set semantics, so adjacency
    intersection preserves multiplicities exactly."""

    if len(attrs) < 3:
        return False
    for b in attrs:
        if b.e == b.v or b.e in consts or b.v in consts:
            return False
        if not catalog.attribute(b.attribute).distinct:
            return False

    parent: dict[Var, Var] = {}

    def find(x: Var) -> Var:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cyclic = False
    for b in attrs:
        re_, rv = find(b.e), find(b.v)
        if re_ == rv:
            cyclic = True
        else:
            parent[re_] = rv
    roots = {find(v) for b in attrs for v in (b.e, b.v)}
    return cyclic and len(roots) == 1


def _hector_wco(
    plan: Hector,
    catalog: Catalog,
    attrs: list[AttributeBinding],
    consts: dict[Var, Any],
    preds: list[BinaryPredicateBinding],
    antis: list[AntijoinBinding],
) -> Relation:
    """Generic worst-case-optimal join by variable elimination — the
    generalized form of operators/wco.py's triangle intersection, for
    ANY cyclic conjunction (reference: Hector's count→propose→validate
    extension, src/plan/hector.rs:934-978, extenders 1093-1493).

    Bind two variables from one scan, then extend one variable at a
    time: every binding connecting the new variable to bound ones
    contributes an adjacency array (forward e→[v] or reverse v→[e]),
    candidates are their row-local ``array_intersect``, and bindings
    whose endpoints are both bound apply as left-semi filters. The
    intermediate never materializes a wedge: it stays at prefix
    cardinality carrying bounded adjacency arrays, and skewed
    high-degree keys cost one long array per row instead of a blown-up
    join partition. The variable order is static (max connectivity),
    but the PROPOSAL order is per-key adaptive: when several bindings
    extend the same variable, each prefix row sorts its adjacency
    lists by size and intersects smallest-first — the declarative form
    of the reference's count→propose→validate min-selection, with the
    same worst-case intermediate bound.
    """

    scans: dict[str, DataFrame] = {}
    for b in attrs:
        if b.attribute not in scans:
            scans[b.attribute] = (
                catalog.attribute(b.attribute).dataframe().select("e", "v")
            )

    uniq = iter(range(10_000))
    b0 = attrs[0]
    df = scans[b0.attribute].select(
        F.col("e").alias(vcol(b0.e)), F.col("v").alias(vcol(b0.v))
    )
    bound: list[Var] = [b0.e, b0.v]
    used = [False] * len(attrs)
    used[0] = True

    while not all(used):
        # Closing bindings: both endpoints bound -> semi-join filter
        # (the validate stage; keeps prefix cardinality, never grows).
        for i, b in enumerate(attrs):
            if used[i] or b.e not in bound or b.v not in bound:
                continue
            ke, kv = f"__we{next(uniq)}", f"__wv{next(uniq)}"
            edge = scans[b.attribute].select(
                F.col("e").alias(ke), F.col("v").alias(kv)
            )
            df = df.join(
                edge,
                on=[
                    F.col(vcol(b.e)) == F.col(ke),
                    F.col(vcol(b.v)) == F.col(kv),
                ],
                how="left_semi",
            )
            used[i] = True
        if all(used):
            break

        # Extension candidates: unbound variables adjacent to the
        # prefix; most-constrained (max incident bindings) first.
        cand: dict[Var, list[int]] = {}
        for i, b in enumerate(attrs):
            if used[i]:
                continue
            if b.e in bound and b.v not in bound:
                cand.setdefault(b.v, []).append(i)
            elif b.v in bound and b.e not in bound:
                cand.setdefault(b.e, []).append(i)
        if not cand:  # pragma: no cover - guarded by connectivity check
            raise ValueError("disconnected WCO conjunction")
        w = max(cand, key=lambda v: (len(cand[v]), str(v)))

        arr_cols: list[str] = []
        for i in cand[w]:
            b = attrs[i]
            key, out = ("e", "v") if b.e in bound else ("v", "e")
            keyvar = b.e if b.e in bound else b.v
            kn, an = f"__wk{next(uniq)}", f"__wa{next(uniq)}"
            adj = (
                scans[b.attribute]
                .groupBy(F.col(key).alias(kn))
                .agg(F.sort_array(F.collect_set(F.col(out))).alias(an))
            )
            df = df.join(
                adj, on=F.col(vcol(keyvar)) == F.col(kn), how="inner"
            ).drop(kn)
            arr_cols.append(an)
            used[i] = True
        if len(arr_cols) == 1:
            candidates = F.col(arr_cols[0])
            df = df.withColumn(vcol(w), F.explode(candidates)).drop(*arr_cols)
        else:
            # Per-key adaptive proposal order — the declarative analogue
            # of the reference's count→propose→validate min-selection
            # (src/plan/hector.rs:934-978): for EACH prefix row, sort
            # the incident adjacency lists by size and fold
            # array_intersect smallest-first, so proposals come from
            # that key's fewest-candidates relation and every later
            # intersect is bounded by the current (shrinking) candidate
            # set, not by a fixed static binding order.
            ws = f"__ws{next(uniq)}"
            df = df.withColumn(
                ws,
                F.expr(
                    f"array_sort(array({', '.join(arr_cols)}), (x, y) -> "
                    "CASE WHEN size(x) < size(y) THEN -1 "
                    "WHEN size(x) > size(y) THEN 1 ELSE 0 END)"
                ),
            )
            candidates = F.expr(
                f"aggregate(slice({ws}, 2, size({ws}) - 1), {ws}[0], "
                "(acc, a) -> array_intersect(acc, a))"
            )
            df = df.withColumn(vcol(w), F.explode(candidates)).drop(
                *arr_cols, ws
            )
        bound.append(w)

    acc = Relation(bound, df, False)
    applied: set[int] = set()
    acc = _apply_ready_predicates(acc, preds, consts, applied)
    if len(applied) != len(preds):
        raise ValueError("predicate references unbound variable")
    for b in antis:
        acc = _apply_antijoin(acc, b, catalog, consts)
    return acc.projected(plan.variables_)


def _fused_scan(
    catalog: Catalog,
    evar: Var,
    bindings: list[AttributeBinding],
    consts: dict[Var, Any],
) -> Relation:
    """One scan for all same-table attributes of one entity variable.

    ``SELECT e_expr AS ?e, v1 AS ?a, v2 AS ?b ... WHERE v_i IS NOT NULL``
    — value-constant bindings become pushed-down equality filters, and a
    variable repeated across two attributes becomes an intra-scan
    equality filter.
    """

    first = catalog.attribute(bindings[0].attribute)
    df = first.table_loader()
    out_vars: list[Var] = [evar]
    exprs: list[Column] = [F.expr(first.e_expr).alias(vcol(evar))]
    cond: Optional[Column] = None
    var_expr: dict[Var, str] = {}
    for b in bindings:
        src = catalog.attribute(b.attribute)
        vexpr = src.v_expr
        notnull = F.expr(vexpr).isNotNull()
        cond = notnull if cond is None else cond & notnull
        if b.v in consts:
            cond = cond & (F.expr(vexpr) == F.lit(consts[b.v]))
        if b.v in var_expr:
            # same variable bound by two attributes -> equality
            cond = cond & (F.expr(vexpr) == F.expr(var_expr[b.v]))
        else:
            var_expr[b.v] = vexpr
            if b.v != evar:
                out_vars.append(b.v)
                exprs.append(F.expr(vexpr).alias(vcol(b.v)))
    if cond is not None:
        df = df.filter(cond)
    return Relation(out_vars, df.select(*exprs), False)


def _apply_ready_predicates(
    acc: Relation,
    preds: list[BinaryPredicateBinding],
    consts: dict[Var, Any],
    applied: set[int],
) -> Relation:
    for i, p in enumerate(preds):
        if i in applied:
            continue
        ops: list[Column] = []
        ready = True
        for var in p.variables_:
            if var in acc.variables:
                ops.append(F.col(vcol(var)))
            elif var in consts:
                ops.append(F.lit(consts[var]))
            else:
                ready = False
                break
        if ready:
            # Hector predicate bindings apply REVERSED: the reference's
            # BinaryPredicateExtender filters extension-vs-prefix such
            # that LT((x, y)) admits y < x (hector.rs:1055-1089 — the
            # Forward arm checks `extension < prefix[x]` where the
            # extension is variables.1; tests/hector_test.rs's ":num"
            # and constant cases pin this down). Plan::Filter is the
            # opposite, positional convention (filter.rs:96-131) —
            # front-ends that mean "a OP b" emit (b, a) bindings.
            acc = Relation(
                acc.variables,
                acc.df.filter(_PREDICATES[p.predicate](ops[1], ops[0])),
                acc.has_diff,
            )
            applied.add(i)
    return acc


def _apply_antijoin(
    acc: Relation,
    b: AntijoinBinding,
    catalog: Catalog,
    consts: dict[Var, Any],
) -> Relation:
    neg = _attr_rel(catalog, b.attribute, b.e, b.v)
    for var in (b.e, b.v):
        if var in consts:
            neg = Relation(
                neg.variables,
                neg.df.filter(F.col(vcol(var)) == F.lit(consts[var])),
                neg.has_diff,
            )
    key = [v for v in neg.variables if v in acc.variables]
    if not key:
        raise ValueError("antijoin binding shares no variable with the query")
    neg = neg.projected(key).distinct()
    rdf = neg.df
    for kv in key:
        rdf = rdf.withColumnRenamed(vcol(kv), f"__rk_{vcol(kv)}")
    cond = [acc.df[vcol(kv)] == rdf[f"__rk_{vcol(kv)}"] for kv in key]
    return Relation(acc.variables, acc.df.join(rdf, on=cond, how="left_anti"), acc.has_diff)


# ---------------------------------------------------------------------------
# Pull queries (reference: src/plan/pull.rs)
# ---------------------------------------------------------------------------


def _pull_level(plan: PullLevel, catalog: Catalog) -> Relation:
    """Emit pull rows per the reference's PullLevel shape
    (src/plan/pull.rs:94-236). Values are cast to string for a uniform
    union schema (the reference's Value enum is untyped on the wire).

    Without ``path_attributes`` each row is ``[path.., aid, v]``. With
    them, the path is interleaved with the attribute literals
    (pull.rs interleave, 52-77): ``[p0, a0, p1, .., pn, aid, v]``.
    Cardinality-single levels (``cardinality_many=False``) drop the
    pulled entity id ``pn`` from attribute rows — there can only be one
    child per (path, link) — and synthesize one
    ``[p0, a0, .., "db__id", pn]`` row per distinct path instead
    (pull.rs:208-226), so the child identity survives in the output.
    """

    base = compile_plan(plan.plan, catalog)
    pv = plan.pull_variable
    path_attrs = list(plan.path_attributes)
    aliases = list(plan.pull_aliases or plan.pull_attributes)
    if len(aliases) != len(plan.pull_attributes):
        raise ValueError("pull_aliases must parallel pull_attributes")

    # Interleaved path prefix: p0, a0, p1, a1, .., pn. The reference
    # interleaves only when both sides are non-empty (interleave, 52-55).
    if path_attrs and len(base.variables) != len(path_attrs) + 1:
        raise ValueError(
            "path_attributes must hold one link per nesting step"
        )
    interleaved: list[Column] = []
    names: list[str] = []
    for i, v in enumerate(base.variables):
        interleaved.append(F.col(vcol(v)))
        names.append(vcol(v))
        if path_attrs and i < len(path_attrs):
            interleaved.append(F.lit(path_attrs[i]))
            names.append(f"__pa{i}")

    single = bool(path_attrs) and not plan.cardinality_many
    prefix = interleaved[:-1] if single else interleaved
    prefix_names = names[:-1] if single else names

    pieces: list[DataFrame] = []
    for aid, out_name in zip(plan.pull_attributes, aliases):
        attr = _attr_rel(catalog, aid, pv, "__pull_v")
        joined = _join_rel(base, attr, [pv])
        pieces.append(
            joined.df.select(
                *prefix,
                F.lit(out_name).alias("__pull_a"),
                F.col(vcol("__pull_v")).cast("string").alias("__pull_vs"),
            )
        )
    if single:
        # One db__id row per distinct path (pull.rs:211-222): the popped
        # child id re-emitted under the synthetic db__id attribute.
        pieces.append(
            base.distinct().df.select(
                *prefix,
                F.lit("db__id").alias("__pull_a"),
                F.col(vcol(base.variables[-1])).cast("string").alias("__pull_vs"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    out_vars = [f"__p{i}" for i in range(len(prefix_names))] + ["__a", "__v"]
    out = out.toDF(*[vcol(v) for v in out_vars])
    return Relation(out_vars, out, False)


def _pull(plan: Pull, catalog: Catalog) -> Relation:
    rels = [_pull_level(p, catalog) for p in plan.paths]
    width = max(len(r.variables) for r in rels)
    # Pad narrower paths with NULL path segments for a uniform schema;
    # all path segments are cast to string so the union's column types
    # do not depend on engine-specific coercion rules.
    dfs = []
    for r in rels:
        df = r.df
        for i in range(len(r.variables) - 2, width - 2):
            df = df.withColumn(f"__pad_{i}", F.lit(None).cast("string"))
        cols = (
            [F.col(vcol(v)).cast("string") for v in r.variables[:-2]]
            + [F.col(f"__pad_{i}") for i in range(len(r.variables) - 2, width - 2)]
            + [F.col(vcol(r.variables[-2])), F.col(vcol(r.variables[-1]))]
        )
        dfs.append(df.select(*cols).toDF(*[f"c{i}" for i in range(width)]))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    out_vars = [f"p{i}" for i in range(width)]
    return Relation(out_vars, out.toDF(*[vcol(v) for v in out_vars]), False)


def _pull_all(plan: PullAll, catalog: Catalog) -> Relation:
    """Dump all (e, a, v) for a set of attributes
    (reference: src/plan/pull.rs:296-357)."""

    pieces = []
    for aid in plan.pull_attributes:
        rel = _attr_rel(catalog, aid, "__e", "__v")
        pieces.append(
            rel.df.select(
                F.col(vcol("__e")).alias(vcol("e")),
                F.lit(aid).alias(vcol("a")),
                F.col(vcol("__v")).cast("string").alias(vcol("v")),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return Relation(["e", "a", "v"], out, False)


def _topk(plan: TopK, catalog: Catalog) -> Relation:
    """Top-k selection (beyond-reference extension, plans.TopK).

    Global form: orderBy + limit — Catalyst's TakeOrderedAndProject
    keeps a k-row heap per partition and merges k rows, so no full
    sort ever materializes (asserted in tests/test_plans.py).
    Partitioned form: one window ranked per group. Input consolidates
    first so retracted tuples cannot place."""

    from pyspark.sql.window import Window

    rel = compile_plan(plan.plan, catalog)
    if rel.has_diff:
        rel = rel.consolidated()
        df = rel.df.filter(F.col(DIFF) > 0).drop(DIFF)
        rel = Relation(rel.variables, df, False)
    order = [
        F.col(vcol(v)).asc() if asc else F.col(vcol(v)).desc()
        for v, asc in plan.order_by
    ]
    if plan.partition_by:
        w = Window.partitionBy(
            *[vcol(v) for v in plan.partition_by]
        ).orderBy(*order)
        df = (
            rel.df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= plan.k)
            .drop("__rk")
        )
    else:
        df = rel.df.orderBy(*order).limit(plan.k)
    out = Relation(rel.variables, df, False)
    return out.projected(plan.variables_) if plan.variables_ else out
