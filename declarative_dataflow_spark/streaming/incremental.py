"""Incrementally-maintained conjunctive queries (delta joins).

The reference maintains Hector (n-way join) results incrementally with
one delta pipeline per attribute binding: pipeline i reacts only to
changes of binding i, joining the change against the OTHER bindings —
bindings before i at their NEW version, bindings after i at their OLD
version. The lexicographic AltNeu timestamp enforces exactly that
old/new split inside timely (reference: src/plan/hector.rs:497-927,
AltNeu scope at 520, ``is_neu = other_idx >= idx`` at 681).

Spark-first realization: the old/new split is explicit data versioning,
not timestamps. Per epoch we build, for every touched binding i,

    delta_i  ⋈  new_1 … new_{i-1}  ⋈  old_{i+1} … old_n

as a Catalyst join chain (each pipeline compiles through the ordinary
Hector compiler against a catalog of versioned snapshots), union the
pipelines, and consolidate. Work per epoch is proportional to the
CHANGE, not the accumulated state: every pipeline starts from a delta
that Catalyst broadcasts when small. Snapshots are localCheckpoint-ed
DataFrames (swap for Delta tables at cluster scale); lineage is
truncated every epoch.

Weighted multisets come for free: delta joins multiply ``diff``
columns, so retractions (diff < 0) propagate through every pipeline
and cancel in consolidation.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import Datom
from ..plan.compiler import DIFF, AttributeSource, Catalog, compile_plan, vcol
from ..plan.plans import (
    AggregationFn,
    AntijoinBinding,
    AttributeBinding,
    Binding,
    Hector,
)


class DeltaJoin:
    """One incrementally-maintained Hector query.

    ``bindings`` may contain attribute, constant, binary-predicate,
    and antijoin bindings. Antijoin (negation) follows the reference's
    AntijoinExtender (hector.rs:1494-1529) ordered LAST: positive-part
    deltas filter against the anti-side's NEW key set, and anti-side
    changes emit toggle diffs — keys whose membership flips retract or
    re-derive the matching core tuples (computed over OLD snapshots,
    semi-join-pruned to just the flipped keys, so the work tracks the
    toggle size, not the accumulated result).
    """

    def __init__(
        self,
        spark: SparkSession,
        variables: list[str],
        bindings: list[Binding],
        initial: Optional[dict[str, DataFrame]] = None,
    ):
        self.spark = spark
        self.variables = list(variables)
        self.bindings = list(bindings)
        self.core_bindings = [
            b for b in bindings if not isinstance(b, AntijoinBinding)
        ]
        self.anti_bindings = [
            b for b in bindings if isinstance(b, AntijoinBinding)
        ]
        self.attr_bindings = [
            b for b in self.core_bindings if isinstance(b, AttributeBinding)
        ]
        # aid -> weighted (e, v, diff) snapshot of everything seen.
        # Snapshots append deltas LAZILY (a weighted union is the same
        # multiset as its consolidation) and compact+checkpoint every
        # ``compact_every`` appends — one big materialization per N
        # epochs instead of per epoch, the analog of differential's
        # batched arrangement merging.
        self.snapshots: dict[str, DataFrame] = {}
        self._appends: dict[str, int] = {}
        self.compact_every = 8
        for aid, df in (initial or {}).items():
            self.snapshots[aid] = df.select("e", "v", "diff").localCheckpoint(
                eager=True
            )
        self.epoch = 0

    # -- snapshot algebra ------------------------------------------------

    @staticmethod
    def _consolidate(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("e", "v")
            .agg(F.sum("diff").alias("diff"))
            .filter(F.col("diff") != 0)
        )

    def _deltas(self, datoms: Iterable[Datom]) -> dict[str, DataFrame]:
        by_aid: dict[str, list[tuple[Any, Any, int]]] = {}
        for d in datoms:
            by_aid.setdefault(d.a, []).append((d.e, d.v, d.diff))
        out = {}
        for aid, rows in by_aid.items():
            # Eagerly materialized: every pipeline references the
            # delta, so one small checkpoint beats re-evaluating the
            # consolidation per pipeline.
            df = self.spark.createDataFrame(rows).toDF("e", "v", "diff")
            out[aid] = self._consolidate(df).localCheckpoint(eager=True)
        return out

    # -- the delta pipelines ---------------------------------------------

    def _pipeline(
        self,
        i: int,
        deltas: dict[str, DataFrame],
        news: dict[str, DataFrame],
    ) -> Optional[Any]:
        """Compile core pipeline i: binding i at its delta, j<i at new,
        j>i at old. Returns None when any required version is absent
        (the join is provably empty)."""

        attrs: dict[str, AttributeSource] = {}
        synth_bindings: list[Binding] = []
        ai = 0
        for b in self.core_bindings:
            if not isinstance(b, AttributeBinding):
                synth_bindings.append(b)
                continue
            if ai < i:
                df = news.get(b.attribute)
            elif ai == i:
                df = deltas.get(b.attribute)
            else:
                df = self.snapshots.get(b.attribute)
            if df is None:
                return None
            key = f"__dj{ai}"
            attrs[key] = AttributeSource(loader=(lambda d=df: d), has_diff=True)
            synth_bindings.append(AttributeBinding(b.e, key, b.v))
            ai += 1
        cat = Catalog(attrs)
        return compile_plan(Hector(self.variables, synth_bindings), cat)

    def _core_at(
        self, versions: dict[str, DataFrame]
    ) -> Optional[Any]:
        """Compile the core conjunction entirely at one snapshot set."""

        attrs: dict[str, AttributeSource] = {}
        synth_bindings: list[Binding] = []
        ai = 0
        for b in self.core_bindings:
            if not isinstance(b, AttributeBinding):
                synth_bindings.append(b)
                continue
            df = versions.get(b.attribute)
            if df is None:
                return None
            key = f"__dj{ai}"
            attrs[key] = AttributeSource(loader=(lambda d=df: d), has_diff=True)
            synth_bindings.append(AttributeBinding(b.e, key, b.v))
            ai += 1
        cat = Catalog(attrs)
        return compile_plan(Hector(self.variables, synth_bindings), cat)

    @staticmethod
    def _positive_keys(df: Optional[DataFrame]) -> Optional[DataFrame]:
        """Present (e, v) pairs of an anti-side snapshot (net weight
        > 0 — the antijoin right side is a set, antijoin.rs:95-97).
        Consolidates first: lazily-appended snapshots may carry an
        assert AND its retraction as separate rows."""

        if df is None:
            return None
        return (
            DeltaJoin._consolidate(df)
            .filter(F.col("diff") > 0)
            .select("e", "v")
        )

    def _anti_filter(self, rel, ab: AntijoinBinding, keys: Optional[DataFrame]):
        """Drop tuples whose (ab.e, ab.v) valuation appears in keys."""

        if keys is None:
            return rel
        k = keys.select(F.col("e").alias("__ae"), F.col("v").alias("__av"))
        df = rel.df.join(
            k,
            on=[
                rel.df[vcol(ab.e)] == k["__ae"],
                rel.df[vcol(ab.v)] == k["__av"],
            ],
            how="left_anti",
        )
        return type(rel)(rel.variables, df, rel.has_diff)

    def _toggle_terms(
        self,
        deltas: dict[str, DataFrame],
        news: dict[str, DataFrame],
        sel: list[str],
    ) -> list[DataFrame]:
        """Per changed anti binding k: tuples of the OLD core (pruned
        to flipped keys) enter (+1, key left the anti set) or leave
        (-1, key joined it); anti bindings before k apply at NEW,
        after k at OLD."""

        out: list[DataFrame] = []
        for k, ab in enumerate(self.anti_bindings):
            if ab.attribute not in deltas:
                continue
            p_old = self._positive_keys(self.snapshots.get(ab.attribute))
            p_new = self._positive_keys(news.get(ab.attribute))
            empty = None
            for keys_from, keys_minus, sign in (
                (p_old, p_new, 1),   # lost membership -> tuples return
                (p_new, p_old, -1),  # gained membership -> tuples retract
            ):
                if keys_from is None:
                    continue
                flipped = (
                    keys_from
                    if keys_minus is None
                    else keys_from.join(keys_minus, ["e", "v"], "left_anti")
                )
                flipped = flipped.localCheckpoint(eager=True)
                if flipped.limit(1).isEmpty():
                    continue
                core = self._core_at(self.snapshots)
                if core is None:
                    continue
                # Prune to the flipped keys (inner join IS the filter).
                fk = flipped.select(
                    F.col("e").alias("__ae"), F.col("v").alias("__av")
                )
                rel = core.with_diff()
                df = rel.df.join(
                    fk,
                    on=[
                        rel.df[vcol(ab.e)] == fk["__ae"],
                        rel.df[vcol(ab.v)] == fk["__av"],
                    ],
                    how="inner",
                ).drop("__ae", "__av")
                pruned = type(rel)(rel.variables, df, True)
                for j, other in enumerate(self.anti_bindings):
                    if j == k:
                        continue
                    versions = news if j < k else self.snapshots
                    pruned = self._anti_filter(
                        pruned,
                        other,
                        self._positive_keys(versions.get(other.attribute)),
                    )
                term = pruned.df.select(*sel)
                if sign < 0:
                    term = term.withColumn(DIFF, -F.col(DIFF))
                out.append(term)
        return out

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        """Apply one transaction; return the result diffs of this epoch
        as a DataFrame over ``variables + [diff]``. Cost is driven by
        the deltas, never by re-joining the full snapshots."""

        return self._advance(self._deltas(datoms))

    def transact_frame(self, batch_df: DataFrame) -> DataFrame:
        """Apply one transaction given as a DataFrame of datoms
        (e, a, v[, diff]) — the streaming path: the batch never passes
        through the driver; only the small distinct-attribute list
        does."""

        cols = batch_df.columns
        diff = F.col("diff") if "diff" in cols else F.lit(1).cast("long")
        base = batch_df.select("e", "a", "v", diff.alias("diff"))
        aids = [r["a"] for r in base.select("a").distinct().collect()]
        deltas = {}
        for aid in aids:
            deltas[aid] = (
                self._consolidate(base.filter(F.col("a") == aid).drop("a"))
                .localCheckpoint(eager=True)
            )
        return self._advance(deltas)

    def _advance(self, deltas: dict[str, DataFrame]) -> DataFrame:
        # Ignore attributes no binding references — a shared transaction
        # stream may carry unrelated facts; tracking them would grow
        # snapshots without ever affecting this query.
        relevant = {b.attribute for b in self.attr_bindings} | {
            b.attribute for b in self.anti_bindings
        }
        deltas = {a: df for a, df in deltas.items() if a in relevant}
        news: dict[str, DataFrame] = {}
        for aid in set(self.snapshots) | set(deltas):
            if aid in deltas and aid in self.snapshots:
                merged = self.snapshots[aid].unionByName(deltas[aid])
                appends = self._appends.get(aid, 0) + 1
                if appends >= self.compact_every:
                    merged = self._consolidate(merged).localCheckpoint(
                        eager=True
                    )
                    appends = 0
                news[aid] = merged
                self._appends[aid] = appends
            elif aid in deltas:
                news[aid] = deltas[aid]
            else:
                news[aid] = self.snapshots[aid]

        sel = [vcol(v) for v in self.variables] + [DIFF]
        pipes: list[DataFrame] = []
        for i, b in enumerate(self.attr_bindings):
            if b.attribute not in deltas:
                continue
            pipe = self._pipeline(i, deltas, news)
            if pipe is None:
                continue
            # Core deltas see the anti sides at their NEW state.
            for ab in self.anti_bindings:
                pipe = self._anti_filter(
                    pipe, ab, self._positive_keys(news.get(ab.attribute))
                )
            pipes.append(pipe.with_diff().df.select(*sel))

        pipes.extend(self._toggle_terms(deltas, news, sel))

        self.snapshots = news
        self.epoch += 1

        if not pipes:
            schema = ", ".join(
                [f"`{v}` string" for v in self.variables] + ["diff long"]
            )
            return self.spark.createDataFrame([], schema=schema)
        union = pipes[0]
        for p in pipes[1:]:
            union = union.unionByName(p)
        out = (
            union.groupBy(*[vcol(v) for v in self.variables])
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        return out.select(
            *[F.col(vcol(v)).alias(v) for v in self.variables],
            F.col(DIFF).alias("diff"),
        )


def stream_delta_join(
    delta_join: DeltaJoin,
    datom_stream: DataFrame,
    sink,
    checkpoint: Optional[str] = None,
    query_name: str = "delta_join",
):
    """Drive a DeltaJoin from a Structured Streaming datom source:
    each micro-batch becomes one epoch of the delta pipelines, and the
    epoch's result diffs go to ``sink(diffs_df, batch_id)``.

    The datom stream has columns (e, a, v[, t][, diff]); missing diff
    defaults to +1. This is the full reference loop — streaming
    transactions in, incrementally-maintained result diffs out — on
    Spark's own micro-batch engine (foreachBatch; epoch == batch).
    Returns the StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(delta_join.transact_frame(batch_df), batch_id)

    writer = (
        datom_stream.writeStream.foreachBatch(process)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


class IncrementalAggregate:
    """Incrementally-maintained grouped aggregation over a DeltaJoin —
    the differential reduce: state is the consolidated (key, value,
    weight) multiset of the join result, and each epoch re-aggregates
    ONLY the keys its delta touched (the reference's aggregates sit on
    differential reduce with the same property,
    src/plan/aggregate_neu.rs).

    Output diffs are (key..., value, diff): the previous aggregate of a
    touched key retracts (-1) and the new one asserts (+1); keys whose
    group empties just retract. Supports MIN, MAX, COUNT, SUM, AVG.
    """

    def __init__(
        self,
        delta_join: DeltaJoin,
        key_variables: list[str],
        aggregation_fn: AggregationFn,
        aggregation_variable: str,
        seed_from_snapshots: bool = False,
    ):
        if aggregation_fn not in (
            AggregationFn.MIN,
            AggregationFn.MAX,
            AggregationFn.COUNT,
            AggregationFn.SUM,
            AggregationFn.AVG,
            AggregationFn.MEDIAN,
            AggregationFn.VARIANCE,
        ):
            raise ValueError(f"unsupported incremental fn {aggregation_fn}")
        self.dj = delta_join
        self.keys = list(key_variables)
        self.fn = aggregation_fn
        self.agg_var = aggregation_variable
        self.state: Optional[DataFrame] = None  # keys + __v + __w
        if seed_from_snapshots and delta_join.snapshots:
            core = delta_join._core_at(delta_join.snapshots)
            if core is not None:
                rel = core.with_diff()
                self.state = (
                    rel.df.select(
                        *[F.col(vcol(k)).alias(k) for k in self.keys],
                        F.col(vcol(self.agg_var)).alias("__v"),
                        F.col(DIFF).alias("__w"),
                    )
                    .groupBy(*self.keys, "__v")
                    .agg(F.sum("__w").alias("__w"))
                    .filter(F.col("__w") != 0)
                    .localCheckpoint(eager=True)
                )

    def _aggregate(self, slice_df: DataFrame) -> DataFrame:
        v, w = F.col("__v"), F.col("__w")
        if self.fn == AggregationFn.MEDIAN:
            # Upper-middle element without interpolation
            # (aggregate_neu.rs:160-166): expand weights, rank per key.
            from pyspark.sql.window import Window

            # diff > 0 guard: sequence(1, n) descends for n < 1, so an
            # over-retracted value would expand instead of vanishing.
            expanded = slice_df.filter(w > 0).withColumn(
                "__rep", F.explode(F.sequence(F.lit(1), w))
            )
            wk = Window.partitionBy(*self.keys).orderBy(v)
            wc = Window.partitionBy(*self.keys)
            ranked = (
                expanded.withColumn("__rn", F.row_number().over(wk))
                .withColumn("__n", F.count(F.lit(1)).over(wc))
            )
            return ranked.filter(
                F.col("__rn") == F.floor(F.col("__n") / 2) + 1
            ).select(*self.keys, v.alias("value"))
        if self.fn == AggregationFn.COUNT:
            out = F.sum(w)
        elif self.fn == AggregationFn.SUM:
            out = F.sum(v * w)
        elif self.fn == AggregationFn.AVG:
            out = F.sum(v * w) / F.sum(w)
        elif self.fn == AggregationFn.VARIANCE:
            # sumsq/n - (sum/n)^2 (aggregate_neu.rs:214-243).
            n = F.sum(w)
            out = F.sum(v * v * w) / n - (F.sum(v * w) / n) * (
                F.sum(v * w) / n
            )
        elif self.fn == AggregationFn.MIN:
            # Over-retracted values (net weight <= 0) are absent from the
            # multiset — same guard as the MEDIAN branch and the batch
            # compiler's order statistics.
            out = F.min(F.when(w > 0, v))
        else:
            out = F.max(F.when(w > 0, v))
        return slice_df.groupBy(*self.keys).agg(out.alias("value"))

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        diffs = self.dj.transact(datoms)
        dproj = (
            diffs.select(
                *[F.col(k) for k in self.keys],
                F.col(self.agg_var).alias("__v"),
                F.col("diff").alias("__w"),
            )
            .groupBy(*self.keys, "__v")
            .agg(F.sum("__w").alias("__w"))
            .filter(F.col("__w") != 0)
            .localCheckpoint(eager=True)
        )
        affected = dproj.select(*self.keys).distinct()

        if self.state is None:
            old_slice = dproj.limit(0)
            merged = dproj
        else:
            old_slice = self.state.join(affected, self.keys, "inner")
            merged = self.state.unionByName(dproj)
        new_state = (
            merged.groupBy(*self.keys, "__v")
            .agg(F.sum("__w").alias("__w"))
            .filter(F.col("__w") != 0)
            .localCheckpoint(eager=True)
        )
        new_slice = new_state.join(affected, self.keys, "inner")

        old_out = self._aggregate(old_slice)
        new_out = self._aggregate(new_slice)
        removed = old_out.exceptAll(new_out).withColumn("diff", F.lit(-1))
        added = new_out.exceptAll(old_out).withColumn("diff", F.lit(1))

        self.state = new_state
        return removed.unionByName(added)


class IncrementalRecursion:
    """Incrementally-maintained linear monotone self-recursive rule.

    The reference runs recursion inside its differential scope, so
    input deltas propagate through the fixpoint iterations instead of
    re-running them (src/lib.rs:943-1019). Spark-first equivalent, per
    epoch over the maintained fixpoint T:

    - additions: delta-seeded semi-naive — D0 = eval(new inputs,
      rule:=T) \\ T, then propagate D_{i+1} = eval(rule:=D_i) \\ total
      until empty. Work tracks the delta, not |T|.
    - retractions: DRed (delete-and-rederive). Because T is a fixpoint
      of the old inputs, the one-step overdeletion seed is simply
      T \\ eval(new inputs, rule:=T); the closure then overdeletes
      tuples derivable only through overdeleted tuples (tuples with an
      intact base derivation under the new inputs are never
      overdeleted), and the insertion phase above re-derives survivors.

    Set semantics throughout (the fixpoint consolidates each iterate,
    reference src/lib.rs:1012-1017). Eligibility (checked by
    ``incremental_recursion_for``): one self-recursive rule, monotone
    plan, linear self-reference, RAW transacted attributes only.

    Scale notes: T and the input snapshots are localCheckpoint-ed
    DataFrames (swap for reliable checkpoints/Delta on a cluster); every
    per-epoch anti-join runs delta-vs-T, which Catalyst broadcasts when
    the delta is small.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        plan,
        initial: Optional[dict[str, DataFrame]] = None,
        max_iterations: int = 200,
    ):
        from ..plan.compiler import Relation

        self.spark = spark
        self.name = name
        self.plan = plan
        self.variables = list(plan.variables())
        self.cols = [vcol(v) for v in self.variables]
        self.max_iterations = max_iterations
        # aid -> consolidated weighted (e, v, diff) input snapshot.
        self.snapshots: dict[str, DataFrame] = {}
        for aid, df in (initial or {}).items():
            self.snapshots[aid] = (
                DeltaJoin._consolidate(df.select("e", "v", "diff"))
                .localCheckpoint(eager=True)
            )
        self._Relation = Relation
        # Seed T with a full semi-naive fixpoint over the snapshots.
        empty = self._empty_df()
        total, _ = self._propagate(self._views(), empty, self._base_delta())
        self.total = total.localCheckpoint(eager=True)

    # -- helpers ---------------------------------------------------------

    def _empty_df(self) -> DataFrame:
        schema = ", ".join(f"`{c}` string" for c in self.cols)
        return self.spark.createDataFrame([], schema=schema)

    def _views(self) -> dict[str, DataFrame]:
        """Present facts per attribute (net weight > 0, set view)."""

        return {
            aid: df.filter(F.col("diff") > 0).select("e", "v")
            for aid, df in self.snapshots.items()
        }

    def _eval(self, views: dict[str, DataFrame], bound=None):
        """Compile the rule body over the snapshot views; ``bound``
        (a DataFrame over self.cols) substitutes the self-reference,
        None leaves it unbound (base case only)."""

        attrs = {
            aid: AttributeSource(loader=(lambda d=df: d), has_diff=False)
            for aid, df in views.items()
        }
        bound_rules = {}
        unbound = {self.name}
        if bound is not None:
            bound_rules = {
                self.name: self._Relation(self.variables, bound, False)
            }
            unbound = set()
        cat = Catalog(attrs, {self.name: self.plan}, bound_rules, unbound)
        rel = compile_plan(self.plan, cat).distinct()
        return rel.df.select(*self.cols)

    def _base_delta(self) -> DataFrame:
        return self._eval(self._views()).localCheckpoint(eager=True)

    def _propagate(
        self,
        views: dict[str, DataFrame],
        total: DataFrame,
        delta: DataFrame,
    ) -> tuple[DataFrame, DataFrame]:
        """Semi-naive insertion: fold ``delta`` (disjoint from
        ``total``) and everything derivable from it into total.
        Returns (new_total, all_added)."""

        added = self._empty_df()
        for _ in range(self.max_iterations):
            if delta.limit(1).isEmpty():
                return total, added
            total = total.unionByName(delta)
            added = added.unionByName(delta)
            step = self._eval(views, bound=delta)
            delta = step.join(total, self.cols, "left_anti").localCheckpoint(
                eager=True
            )
        raise RuntimeError(
            f"incremental fixpoint did not converge in {self.max_iterations}"
        )

    def current(self) -> DataFrame:
        """The maintained fixpoint as (variables..., diff=1) — used to
        replay state on subscription."""

        out = self.total.select(
            *[F.col(vcol(v)).alias(v) for v in self.variables]
        )
        return out.withColumn("diff", F.lit(1).cast("long"))

    # -- epoch advancement ----------------------------------------------

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        by_aid: dict[str, list[tuple[Any, Any, int]]] = {}
        relevant = set(self.snapshots)
        for d in datoms:
            if d.a in relevant:
                by_aid.setdefault(d.a, []).append((d.e, d.v, d.diff))

        any_negative = False
        for aid, rows_ in by_aid.items():
            delta = DeltaJoin._consolidate(
                self.spark.createDataFrame(rows_).toDF("e", "v", "diff")
            ).localCheckpoint(eager=True)
            merged = DeltaJoin._consolidate(
                self.snapshots[aid].unionByName(delta)
            ).localCheckpoint(eager=True)
            self.snapshots[aid] = merged
            if any(r[2] < 0 for r in rows_):
                any_negative = True

        if not by_aid:
            return self._diffs(self._empty_df(), self._empty_df())

        views = self._views()
        t_old = self.total
        overdeleted = self._empty_df()

        if any_negative:
            # One-step lost support: T was a fixpoint of the old
            # inputs, so anything not re-derivable from (new inputs, T)
            # lost a derivation through a deleted fact.
            one_step = self._eval(views, bound=t_old)
            o_i = t_old.join(one_step, self.cols, "left_anti").localCheckpoint(
                eager=True
            )
            # Tuples with an intact base derivation are never
            # overdeleted (their support does not pass through the
            # rule), which keeps the closure delta-sized.
            base_new = self._base_delta()
            remaining = t_old
            for _ in range(self.max_iterations):
                if o_i.limit(1).isEmpty():
                    break
                overdeleted = overdeleted.unionByName(o_i)
                remaining = remaining.join(o_i, self.cols, "left_anti")
                derived = self._eval(views, bound=o_i)
                o_i = (
                    derived.join(remaining, self.cols, "left_semi")
                    .join(base_new, self.cols, "left_anti")
                    .dropDuplicates(self.cols)
                    .localCheckpoint(eager=True)
                )
            else:
                raise RuntimeError("overdeletion closure did not converge")
            t1 = t_old.join(
                overdeleted, self.cols, "left_anti"
            ).localCheckpoint(eager=True)
        else:
            t1 = t_old

        # Insertion phase re-derives overdeleted survivors AND folds in
        # new-input derivations in one delta-seeded pass.
        d0 = (
            self._eval(views, bound=t1)
            .join(t1, self.cols, "left_anti")
            .dropDuplicates(self.cols)
            .localCheckpoint(eager=True)
        )
        new_total, added = self._propagate(views, t1, d0)
        self.total = new_total.localCheckpoint(eager=True)
        return self._diffs(added, overdeleted)

    def _diffs(self, added: DataFrame, overdeleted: DataFrame) -> DataFrame:
        """Net output diffs: T_old = T1 ∪ overdeleted and added is
        disjoint from T1, so genuinely-new tuples are added \\
        overdeleted, and gone tuples are overdeleted \\ added — both
        delta-sized anti-joins."""

        plus = added.join(overdeleted, self.cols, "left_anti").withColumn(
            DIFF, F.lit(1).cast("long")
        )
        minus = overdeleted.join(added, self.cols, "left_anti").withColumn(
            DIFF, F.lit(-1).cast("long")
        )
        out = plus.unionByName(minus)
        return out.select(
            *[F.col(vcol(v)).alias(v) for v in self.variables],
            F.col(DIFF).alias("diff"),
        )


def incremental_recursion_for(engine, name: str):
    """Build an IncrementalRecursion for a rule when eligible: the rule
    is the only member of its recursive cycle, references itself once
    (linear), is monotone, depends on no other rules, and reads only
    RAW transacted attributes. Returns None otherwise."""

    from ..engine import InputSemantics, _is_monotone, _self_ref_count
    from ..plan.plans import (
        Hector as HectorPlan,
        MatchA,
        MatchAV,
        MatchEA,
        Plan,
    )

    plan = engine.rules.get(name)
    if plan is None:
        return None
    if engine._recursive_rules(name) != {name}:
        return None
    if not _is_monotone(plan) or _self_ref_count(plan, name) != 1:
        return None
    if engine._dependencies(plan) != {name}:
        return None

    aids: set[str] = set()
    unsupported = False

    def walk(p) -> None:
        nonlocal unsupported
        if isinstance(p, (MatchA, MatchEA, MatchAV)):
            aids.add(p.attribute)
        elif isinstance(p, HectorPlan):
            for b in p.bindings:
                if isinstance(b, (AttributeBinding, AntijoinBinding)):
                    if isinstance(b, AntijoinBinding):
                        unsupported = True
                    aids.add(b.attribute)
        for attr in getattr(p, "__dataclass_fields__", {}):
            v = getattr(p, attr)
            if isinstance(v, Plan):
                walk(v)
            elif isinstance(v, list):
                for item in v:
                    if isinstance(item, Plan):
                        walk(item)

    walk(plan)
    if unsupported or not aids:
        return None
    initial = {}
    for aid in aids:
        ta = engine._transacted.get(aid)
        if ta is None or ta.config.input_semantics != InputSemantics.RAW:
            return None
        initial[aid] = ta.dataframe().select("e", "v", "diff")
    return IncrementalRecursion(engine.spark, name, plan, initial)
