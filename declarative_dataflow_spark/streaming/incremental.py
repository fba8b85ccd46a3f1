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
from ..plan.compiler import (
    DIFF,
    AttributeSource,
    Catalog,
    UnboundRule,
    compile_plan,
    vcol,
)
from ..plan.plans import (
    AggregationFn,
    AntijoinBinding,
    AttributeBinding,
    Binding,
    Hector,
)


class SemanticsDeltaSource:
    """Effective-view delta translation for a LWW or Distinct
    attribute: raw datom batches rewrite history (a later write
    retracts the previous winner; a duplicate add changes nothing), so
    the RAW datom delta is NOT the collection delta. This adapter
    tracks the attribute's effective rows and emits, per epoch, the
    (e, v, diff) changes of the EFFECTIVE view — which downstream
    delta pipelines consume like any RAW delta (the reference applies
    input semantics at ingest, src/server/mod.rs:355-361, so its
    dataflow likewise only ever sees the rewritten collection).

    Per-epoch work is delta-sized: the semantics window recomputes only
    over the touched entities' history (per-key history is bounded by
    trace_slack compaction), and the stored effective view updates with
    one anti-join + union on the touched keys.
    """

    def __init__(self, ta):
        from ..engine import _apply_input_semantics

        self._ta = ta
        self._apply = _apply_input_semantics
        self.prev = (
            ta.dataframe().select("e", "v").localCheckpoint(eager=True)
        )

    def initial(self) -> DataFrame:
        """Current effective rows as a weighted snapshot."""

        return self.prev.withColumn("diff", F.lit(1).cast("long"))

    def delta(self, batch_rows: list[tuple]) -> DataFrame:
        """Effective-view changes caused by this epoch's datoms (which
        the engine has already transacted into the attribute)."""

        spark = self.prev.sparkSession
        touched = (
            spark.createDataFrame([(r[0],) for r in batch_rows])
            .toDF("e")
            .distinct()
            .localCheckpoint(eager=True)
        )
        hist = self._ta._raw_dataframe().join(touched, "e", "left_semi")
        new_eff = (
            self._apply(hist, self._ta.config)
            .select("e", "v")
            .localCheckpoint(eager=True)
        )
        old_eff = self.prev.join(touched, "e", "left_semi")
        plus = new_eff.join(old_eff, ["e", "v"], "left_anti").withColumn(
            "diff", F.lit(1).cast("long")
        )
        minus = old_eff.join(new_eff, ["e", "v"], "left_anti").withColumn(
            "diff", F.lit(-1).cast("long")
        )
        self.prev = (
            self.prev.join(touched, "e", "left_anti")
            .unionByName(new_eff)
            .localCheckpoint(eager=True)
        )
        return plus.unionByName(minus).localCheckpoint(eager=True)


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
        semantics: Optional[dict[str, "SemanticsDeltaSource"]] = None,
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
        # aid -> SemanticsDeltaSource for LWW/Distinct attributes: raw
        # datom batches translate to effective-view deltas first.
        self.semantics = dict(semantics or {})
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
            if aid in self.semantics:
                # LWW/Distinct: the collection delta is the change of
                # the EFFECTIVE view, not the raw datoms.
                eff = self.semantics[aid].delta(rows)
                if not eff.limit(1).isEmpty():
                    out[aid] = eff
                continue
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
            *[F.col(vcol(v)).alias(str(v)) for v in self.variables],
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
            AggregationFn.STDDEV,
        ):
            raise ValueError(f"unsupported incremental fn {aggregation_fn}")
        self.dj = delta_join
        self.keys = list(key_variables)
        self.fn = aggregation_fn
        self.agg_var = aggregation_variable
        self.state: Optional[DataFrame] = None  # keys + __v + __w
        if (
            seed_from_snapshots
            and hasattr(delta_join, "current")
            # Maintainers tracking their own materialized state (e.g.
            # IncrementalRecursion, or a renamed DeltaJoin re-deriving
            # from snapshots) seed the reduce from it directly — the
            # differential reduce-over-iterate composition. None means
            # nothing is transacted yet; the state seeds empty.
            and (cur := delta_join.current()) is not None
        ):
            self.state = (
                cur.select(
                    *[F.col(k) for k in self.keys],
                    F.col(self.agg_var).alias("__v"),
                    F.col("diff").alias("__w"),
                )
                .groupBy(*self.keys, "__v")
                .agg(F.sum("__w").alias("__w"))
                .filter(F.col("__w") != 0)
                .localCheckpoint(eager=True)
            )
        elif seed_from_snapshots and delta_join.snapshots:
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
        elif self.fn in (AggregationFn.VARIANCE, AggregationFn.STDDEV):
            # sumsq/n - (sum/n)^2 (aggregate_neu.rs:214-243); STDDEV is
            # its square root (the reference stubs it, aggregate_neu.rs:37-38).
            n = F.sum(w)
            out = F.sum(v * v * w) / n - (F.sum(v * w) / n) * (
                F.sum(v * w) / n
            )
            if self.fn == AggregationFn.STDDEV:
                out = F.sqrt(out)
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


class IncrementalTopK:
    """Incrementally-maintained top-k over a DeltaJoin (the streaming
    form of plans.TopK): state is the consolidated tuple multiset, and
    each epoch re-ranks ONLY the touched partitions (or the global
    ranking when unpartitioned), emitting retract/assert diffs of the
    top-k rows. Retraction of a ranked tuple pulls in the runner-up —
    the case windowless approximations get wrong — because the full
    multiset (not just the current top-k) is retained, exactly like
    differential's arranged input to a reduce."""

    def __init__(
        self,
        delta_join: "DeltaJoin",
        order_by: list[tuple[str, bool]],
        k: int,
        partition_by: Optional[list[str]] = None,
        seed_from_snapshots: bool = False,
    ):
        self.dj = delta_join
        self.order_by = list(order_by)
        self.k = k
        self.partition_by = list(partition_by or [])
        self.vars = [str(v) for v in delta_join.variables]
        self.state: Optional[DataFrame] = None  # vars + __w
        if seed_from_snapshots and delta_join.snapshots:
            core = delta_join._core_at(delta_join.snapshots)
            if core is not None:
                rel = core.with_diff()
                self.state = (
                    rel.df.select(
                        *[
                            F.col(vcol(v)).alias(str(v))
                            for v in delta_join.variables
                        ],
                        F.col(DIFF).alias("__w"),
                    )
                    .groupBy(*self.vars)
                    .agg(F.sum("__w").alias("__w"))
                    .filter(F.col("__w") != 0)
                    .localCheckpoint(eager=True)
                )

    def _order_cols(self):
        return [
            F.col(v).asc() if asc else F.col(v).desc()
            for v, asc in self.order_by
        ]

    def _topk(self, slice_df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        present = slice_df.filter(F.col("__w") > 0).drop("__w")
        if self.partition_by:
            w = Window.partitionBy(*self.partition_by).orderBy(
                *self._order_cols()
            )
        else:
            w = Window.partitionBy(F.lit(1)).orderBy(*self._order_cols())
        return (
            present.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= self.k)
            .drop("__rk")
        )

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        diffs = self.dj.transact(datoms)
        dproj = (
            diffs.select(*self.vars, F.col("diff").alias("__w"))
            .groupBy(*self.vars)
            .agg(F.sum("__w").alias("__w"))
            .filter(F.col("__w") != 0)
            .localCheckpoint(eager=True)
        )
        merged = (
            dproj if self.state is None else self.state.unionByName(dproj)
        )
        new_state = (
            merged.groupBy(*self.vars)
            .agg(F.sum("__w").alias("__w"))
            .filter(F.col("__w") != 0)
            .localCheckpoint(eager=True)
        )
        if self.partition_by:
            touched = dproj.select(*self.partition_by).distinct()
            old_slice = (
                self.state.join(touched, self.partition_by, "inner")
                if self.state is not None
                else dproj.limit(0)
            )
            new_slice = new_state.join(touched, self.partition_by, "inner")
        else:
            old_slice = self.state if self.state is not None else dproj.limit(0)
            new_slice = new_state
        old_out = self._topk(old_slice)
        new_out = self._topk(new_slice)
        removed = old_out.exceptAll(new_out).withColumn("diff", F.lit(-1))
        added = new_out.exceptAll(old_out).withColumn("diff", F.lit(1))
        self.state = new_state
        return removed.unionByName(added)


class IncrementalRecursion:
    """Incrementally-maintained monotone recursive rule SYSTEM.

    The reference runs recursion inside its differential scope, so
    input deltas propagate through the fixpoint iterations instead of
    re-running them (src/lib.rs:943-1019). Spark-first equivalent over
    the maintained per-rule fixpoints T[r] — every rule in the
    recursive cycle advances together, mutual recursion and non-linear
    rules included (delta steps come from the same occurrence-level
    rewrite the batch evaluator uses, engine._delta_step_plan):

    - additions: delta-seeded generalized semi-naive — D0[r] =
      eval(r over new inputs, cycle:=T) \\ T[r], then propagate
      D_{i+1}[r] = eval(delta step of r) \\ total[r] until every
      rule's delta is empty. Work tracks the delta, not |T|.
    - retractions: DRed (delete-and-rederive) over the whole cycle.
      Each T[r] is a fixpoint of the old inputs, so the one-step
      overdeletion seed is T[r] \\ eval(r over new inputs, cycle:=T);
      the closure then overdeletes tuples derivable only through
      overdeleted tuples of ANY cycle rule (tuples with an intact
      non-recursive derivation under the new inputs are never
      overdeleted), and the insertion phase re-derives survivors.

    Set semantics throughout (the fixpoint consolidates each iterate,
    reference src/lib.rs:1012-1017). Eligibility (checked by
    ``incremental_recursion_for``): every cycle rule monotone with
    dependencies inside the cycle, over transacted attributes (RAW
    directly; LWW/Distinct through effective-view delta adapters).

    Scale notes: T and the input snapshots are localCheckpoint-ed
    DataFrames (swap for reliable checkpoints/Delta on a cluster); every
    per-epoch anti-join runs delta-vs-T, which Catalyst broadcasts when
    the delta is small.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        rules,
        initial: Optional[dict[str, DataFrame]] = None,
        max_iterations: int = 200,
        semantics: Optional[dict[str, "SemanticsDeltaSource"]] = None,
    ):
        from ..engine import _delta_step_plan
        from ..plan.compiler import Relation
        from ..plan.plans import Plan

        if isinstance(rules, Plan):  # single self-recursive rule
            rules = {name: rules}
        self.spark = spark
        self.name = name
        self.rules = dict(rules)
        self.recursive = set(self.rules)
        self.variables = {
            rn: list(p.variables()) for rn, p in self.rules.items()
        }
        self.cols = {
            rn: [vcol(v) for v in vs] for rn, vs in self.variables.items()
        }
        self.max_iterations = max_iterations
        self.steps = {
            rn: _delta_step_plan(p, self.recursive)
            for rn, p in self.rules.items()
        }
        # aid -> consolidated weighted (e, v, diff) input snapshot.
        # LWW/Distinct attributes snapshot their EFFECTIVE view and
        # translate raw batches through a SemanticsDeltaSource.
        self.semantics = dict(semantics or {})
        self.snapshots: dict[str, DataFrame] = {}
        for aid, df in (initial or {}).items():
            self.snapshots[aid] = (
                DeltaJoin._consolidate(df.select("e", "v", "diff"))
                .localCheckpoint(eager=True)
            )
        self._Relation = Relation
        # Seed T with a full generalized semi-naive fixpoint.
        views = self._views()
        d0 = {}
        for rn in self.recursive:
            base = self._eval_base(rn, views)
            if base is not None:
                d0[rn] = base.dropDuplicates(self.cols[rn]).localCheckpoint(
                    eager=True
                )
        self.totals, _ = self._propagate(views, {}, d0)

    # -- helpers ---------------------------------------------------------

    def _empty_df(self, rn: str) -> DataFrame:
        schema = ", ".join(f"`{c}` string" for c in self.cols[rn])
        return self.spark.createDataFrame([], schema=schema)

    def _views(self) -> dict[str, DataFrame]:
        """Present facts per attribute (net weight > 0, set view)."""

        return {
            aid: df.filter(F.col("diff") > 0).select("e", "v")
            for aid, df in self.snapshots.items()
        }

    def _attr_catalog(self, views: dict[str, DataFrame]) -> dict:
        return {
            aid: AttributeSource(loader=(lambda d=df: d), has_diff=False)
            for aid, df in views.items()
        }

    def _eval_base(self, rn: str, views) -> Optional[DataFrame]:
        """Non-recursive derivations of ``rn`` (cycle names unbound)."""

        cat = Catalog(
            self._attr_catalog(views), self.rules, {}, set(self.recursive)
        )
        try:
            rel = compile_plan(self.rules[rn], cat).distinct()
        except UnboundRule:
            return None  # pure-recursive rule: no base case
        return rel.df.select(*self.cols[rn])

    def _eval_full(
        self, rn: str, views, bound: dict[str, DataFrame]
    ) -> Optional[DataFrame]:
        """One derivation step of ``rn`` with cycle rules bound to the
        given iterates (missing ones unbound -> branch drops)."""

        bound_rules = {
            m: self._Relation(self.variables[m], df, False)
            for m, df in bound.items()
        }
        cat = Catalog(
            self._attr_catalog(views),
            self.rules,
            bound_rules,
            self.recursive - set(bound),
        )
        try:
            rel = compile_plan(self.rules[rn], cat).distinct()
        except UnboundRule:
            return None
        return rel.df.select(*self.cols[rn])

    def _eval_delta(
        self,
        rn: str,
        views,
        deltas: dict[str, DataFrame],
        news: dict[str, DataFrame],
    ) -> Optional[DataFrame]:
        """One delta step of ``rn``: each recursive occurrence reads its
        rule's delta in one variant, the accumulated totals elsewhere."""

        bound_rules = {}
        unbound = set()
        for m in self.recursive:
            if m in deltas:
                bound_rules[f"{m}@delta"] = self._Relation(
                    self.variables[m], deltas[m], False
                )
            else:
                unbound.add(f"{m}@delta")
            if m in news:
                bound_rules[f"{m}@new"] = self._Relation(
                    self.variables[m], news[m], False
                )
            else:
                unbound.add(f"{m}@new")
        cat = Catalog(
            self._attr_catalog(views), self.rules, bound_rules, unbound
        )
        try:
            rel = compile_plan(self.steps[rn], cat).distinct()
        except UnboundRule:
            return None
        return rel.df.select(*self.cols[rn])

    def _propagate(
        self,
        views: dict[str, DataFrame],
        totals: dict[str, DataFrame],
        deltas: dict[str, DataFrame],
    ) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
        """Generalized semi-naive insertion: fold per-rule deltas
        (disjoint from totals) and everything derivable from them in.
        Returns (new_totals, all_added)."""

        totals = dict(totals)
        added: dict[str, DataFrame] = {}
        for _ in range(self.max_iterations):
            deltas = {
                rn: d
                for rn, d in deltas.items()
                if not d.limit(1).isEmpty()
            }
            if not deltas:
                return totals, added
            for rn, d in deltas.items():
                totals[rn] = (
                    totals[rn].unionByName(d) if rn in totals else d
                )
                added[rn] = (
                    added[rn].unionByName(d) if rn in added else d
                )
            nxt: dict[str, DataFrame] = {}
            for rn in sorted(self.recursive):
                step = self._eval_delta(rn, views, deltas, totals)
                if step is None:
                    continue
                d = step
                if rn in totals:
                    d = d.join(totals[rn], self.cols[rn], "left_anti")
                d = d.dropDuplicates(self.cols[rn]).localCheckpoint(
                    eager=True
                )
                nxt[rn] = d
            deltas = nxt
        raise RuntimeError(
            f"incremental fixpoint did not converge in {self.max_iterations}"
        )

    def current(self) -> DataFrame:
        """The maintained fixpoint of the subscribed rule as
        (variables..., diff=1) — used to replay state on subscription."""

        rn = self.name
        total = self.totals.get(rn, self._empty_df(rn))
        out = total.select(
            *[F.col(vcol(v)).alias(str(v)) for v in self.variables[rn]]
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
            if aid in self.semantics:
                # Rewrite-at-ingest semantics: the collection delta is
                # the change of the effective view.
                delta = self.semantics[aid].delta(rows_)
                if delta.limit(1).isEmpty():
                    continue
                if not delta.filter(F.col("diff") < 0).limit(1).isEmpty():
                    any_negative = True
            else:
                delta = DeltaJoin._consolidate(
                    self.spark.createDataFrame(rows_).toDF("e", "v", "diff")
                ).localCheckpoint(eager=True)
                if any(r[2] < 0 for r in rows_):
                    any_negative = True
            merged = DeltaJoin._consolidate(
                self.snapshots[aid].unionByName(delta)
            ).localCheckpoint(eager=True)
            self.snapshots[aid] = merged

        rn0 = self.name
        if not by_aid:
            return self._diffs(None, None)

        views = self._views()
        t_old = dict(self.totals)
        overdeleted: dict[str, DataFrame] = {}

        if any_negative:
            # One-step lost support per rule: T was a fixpoint of the
            # old inputs, so anything not re-derivable from (new
            # inputs, T) lost a derivation through a deleted fact.
            o_cur: dict[str, DataFrame] = {}
            base_new: dict[str, DataFrame] = {}
            remaining = dict(t_old)
            for rn in sorted(self.recursive):
                if rn not in t_old:
                    continue
                one_step = self._eval_full(rn, views, t_old)
                lost = (
                    t_old[rn]
                    if one_step is None
                    else t_old[rn].join(one_step, self.cols[rn], "left_anti")
                )
                lost = lost.localCheckpoint(eager=True)
                if not lost.limit(1).isEmpty():
                    o_cur[rn] = lost
                b = self._eval_base(rn, views)
                base_new[rn] = (
                    self._empty_df(rn) if b is None else b
                )
            for _ in range(self.max_iterations):
                if not o_cur:
                    break
                for rn, o in o_cur.items():
                    overdeleted[rn] = (
                        overdeleted[rn].unionByName(o)
                        if rn in overdeleted
                        else o
                    )
                    remaining[rn] = remaining[rn].join(
                        o, self.cols[rn], "left_anti"
                    )
                nxt: dict[str, DataFrame] = {}
                for rn in sorted(self.recursive):
                    if rn not in remaining:
                        continue
                    # Tuples derivable through an overdeleted tuple of
                    # any cycle rule; an intact non-recursive
                    # derivation shields a tuple from overdeletion,
                    # which keeps the closure delta-sized.
                    derived = self._eval_delta(rn, views, o_cur, t_old)
                    if derived is None:
                        continue
                    o = (
                        derived.join(remaining[rn], self.cols[rn], "left_semi")
                        .join(base_new[rn], self.cols[rn], "left_anti")
                        .dropDuplicates(self.cols[rn])
                        .localCheckpoint(eager=True)
                    )
                    if not o.limit(1).isEmpty():
                        nxt[rn] = o
                o_cur = nxt
            else:
                raise RuntimeError("overdeletion closure did not converge")
            t1 = {
                rn: (
                    t_old[rn].join(
                        overdeleted[rn], self.cols[rn], "left_anti"
                    ).localCheckpoint(eager=True)
                    if rn in overdeleted
                    else t_old[rn]
                )
                for rn in t_old
            }
        else:
            t1 = t_old

        # Insertion phase re-derives overdeleted survivors AND folds in
        # new-input derivations in one delta-seeded pass.
        d0: dict[str, DataFrame] = {}
        for rn in sorted(self.recursive):
            step = self._eval_full(rn, views, t1)
            if step is None:
                continue
            d = step
            if rn in t1:
                d = d.join(t1[rn], self.cols[rn], "left_anti")
            d = d.dropDuplicates(self.cols[rn]).localCheckpoint(eager=True)
            if not d.limit(1).isEmpty():
                d0[rn] = d
        new_totals, added = self._propagate(views, t1, d0)
        self.totals = {
            rn: df.localCheckpoint(eager=True)
            for rn, df in new_totals.items()
        }
        return self._diffs(added.get(rn0), overdeleted.get(rn0))

    def _diffs(
        self,
        added: Optional[DataFrame],
        overdeleted: Optional[DataFrame],
    ) -> DataFrame:
        """Net output diffs for the subscribed rule: T_old = T1 ∪
        overdeleted and added is disjoint from T1, so genuinely-new
        tuples are added \\ overdeleted, and gone tuples are
        overdeleted \\ added — both delta-sized anti-joins."""

        rn = self.name
        cols = self.cols[rn]
        if added is None:
            added = self._empty_df(rn)
        if overdeleted is None:
            overdeleted = self._empty_df(rn)
        plus = added.join(overdeleted, cols, "left_anti").withColumn(
            DIFF, F.lit(1).cast("long")
        )
        minus = overdeleted.join(added, cols, "left_anti").withColumn(
            DIFF, F.lit(-1).cast("long")
        )
        out = plus.unionByName(minus)
        return out.select(
            *[F.col(vcol(v)).alias(str(v)) for v in self.variables[rn]],
            F.col(DIFF).alias("diff"),
        )


class RenamedMaintainer:
    """Positional column rename over a maintainer's diff/current
    outputs — aligns the maintained relation's variable columns with
    the names a consuming NameExpr chose. Wraps IncrementalRecursion
    (rule variables) or DeltaJoin (``source_vars=dj.variables``)."""

    def __init__(self, inner, names, source_vars=None):
        self.inner = inner
        if source_vars is None:
            source_vars = inner.variables[inner.name]
        if len(source_vars) != len(names):
            raise ValueError(
                f"arity {len(source_vars)} != {len(names)}"
            )
        self.mapping = [
            (str(a), str(b)) for a, b in zip(source_vars, names)
        ]

    @property
    def snapshots(self):
        return self.inner.snapshots

    def _rename(self, df: DataFrame) -> DataFrame:
        for old, new in self.mapping:
            if old != new:
                df = df.withColumnRenamed(old, new)
        return df

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        return self._rename(self.inner.transact(datoms))

    def current(self) -> Optional[DataFrame]:
        """The maintained relation as (vars..., diff) — from the
        inner's own materialized state, or re-derived from a
        DeltaJoin's snapshots; None when nothing is seeded yet."""

        if hasattr(self.inner, "current"):
            return self._rename(self.inner.current())
        core = self.inner._core_at(self.inner.snapshots)
        if core is None:
            return None
        rel = core.with_diff()
        df = rel.df.select(
            *[
                F.col(vcol(v)).alias(str(v))
                for v in self.inner.variables
            ],
            F.col(DIFF).alias("diff"),
        )
        return self._rename(df)


def incremental_recursion_for(engine, name: str):
    """Build an IncrementalRecursion for a rule when eligible: the rule
    belongs to a recursive cycle whose members are all monotone with
    rule dependencies inside the cycle (mutual recursion and non-linear
    self-references included), reading transacted attributes — RAW
    directly, LWW/Distinct via SemanticsDeltaSource adapters. Returns
    None otherwise."""

    from ..engine import InputSemantics, _is_monotone
    from ..plan.plans import (
        Hector as HectorPlan,
        MatchA,
        MatchAV,
        MatchEA,
        Plan,
    )

    cycle = engine._recursive_rules(name)
    if not cycle or name not in cycle:
        return None
    for rn in cycle:
        plan = engine.rules[rn]
        if not _is_monotone(plan, cycle):
            return None
        if not engine._dependencies(plan) <= cycle:
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

    for rn in cycle:
        walk(engine.rules[rn])
    if unsupported or not aids:
        return None
    initial = {}
    semantics = {}
    for aid in aids:
        ta = engine._transacted.get(aid)
        if ta is None:
            return None
        if ta.config.input_semantics != InputSemantics.RAW:
            adapter = SemanticsDeltaSource(ta)
            semantics[aid] = adapter
            initial[aid] = adapter.initial()
        else:
            initial[aid] = ta.dataframe().select("e", "v", "diff")
    return IncrementalRecursion(
        engine.spark,
        name,
        {rn: engine.rules[rn] for rn in cycle},
        initial,
        semantics=semantics,
    )


class IncrementalShortestPaths:
    """Incrementally-maintained minimum path costs over a changing
    edge set — the lattice-aggregate recursion (operators/graph.py::
    shortest_hops / shortest_paths) the set-semantics
    IncrementalRecursion cannot cover. Unweighted (every edge costs 1,
    output column ``hops``) and non-negative-weighted (``cost=``
    column, output ``cost``) in one maintainer.

    Per epoch of edge additions/retractions, work tracks the CHANGE:

    - additions / weight decreases (monotone): seed candidates from
      the improving edges and their one-step compositions with the
      maintained distance table, then run the same delta relaxation as
      the batch operator — only improving rows propagate.
    - retractions (DRed for the min lattice; the set-semantics
      analogue is IncrementalRecursion's delete-rederive,
      incremental.py:726): a pair (x, y) is AFFECTED iff some minimal
      path routes through a removed edge (s, t) — exactly
      d(x,s) + w(s,t) + d(t,y) == d(x,y) with d(v,v) = 0 — computed by
      two joins against the maintained table, never a graph scan.
      Affected rows are over-deleted, then re-derived by relaxation
      seeded from the SURVIVING rows (their distances are provably
      unchanged) and the remaining edges. A weight INCREASE is a
      retraction plus an addition in the same epoch.

    State: the (x, y, hops|cost) table plus the weighted edge set,
    localCheckpointed per epoch. ``apply`` returns weighted diffs
    (x, y, val, diff); ``current`` is the maintained table, always
    equal to the batch operator on the current edges (gated in
    test_incremental.py). ``sources`` bounds all-pairs state exactly
    as in the batch operators.
    """

    def __init__(
        self,
        edges: DataFrame,
        src: str = "src",
        dst: str = "dst",
        cost: Optional[str] = None,
        sources: Optional[DataFrame] = None,
        max_iters: int = 100,
    ) -> None:
        from ..operators.graph import shortest_hops, shortest_paths

        self.max_iters = max_iters
        self.weighted = cost is not None
        self.val = "cost" if self.weighted else "hops"
        if self.weighted:
            self.edges = (
                edges.select(
                    F.col(src).alias("s"),
                    F.col(dst).alias("t"),
                    F.col(cost).alias("w"),
                )
                .groupBy("s", "t")
                .agg(F.min("w").alias("w"))
                .localCheckpoint(eager=True)
            )
        else:
            self.edges = (
                edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
                .distinct()
                .withColumn("w", F.lit(1))
                .localCheckpoint(eager=True)
            )
        self.sources = (
            sources.select(
                F.col(sources.columns[0]).alias("s")
            ).distinct().localCheckpoint(eager=True)
            if sources is not None
            else None
        )
        if self.weighted:
            init = shortest_paths(
                self.edges, src="s", dst="t", cost="w",
                max_iters=max_iters, sources=self.sources,
            )
        else:
            init = shortest_hops(
                self.edges.drop("w"), src="s", dst="t",
                max_iters=max_iters, sources=self.sources,
            )
        self.dist = init.localCheckpoint(eager=True)

    def current(self) -> DataFrame:
        return self.dist

    def _norm_add(self, df: Optional[DataFrame]) -> Optional[DataFrame]:
        """(s, t, w): first two columns are endpoints; weighted mode
        takes w from the third column, unweighted sets w = 1."""

        if df is None:
            return None
        cols = df.columns
        out = df.select(
            F.col(cols[0]).alias("s"), F.col(cols[1]).alias("t"),
            *(
                [F.col(cols[2]).alias("w")]
                if self.weighted
                else [F.lit(1).alias("w")]
            ),
        )
        return out.groupBy("s", "t").agg(F.min("w").alias("w"))

    @staticmethod
    def _norm_rem(df: Optional[DataFrame]) -> Optional[DataFrame]:
        """Retractions are (s, t) pairs — removing the edge regardless
        of its stored weight."""

        if df is None:
            return None
        a, b = df.columns[0], df.columns[1]
        return df.select(F.col(a).alias("s"), F.col(b).alias("t")).distinct()

    def _affected(self, rem_w: DataFrame) -> DataFrame:
        """Pairs (x, y) whose minimal cost may change when the
        ``rem_w`` (s, t, w) edges disappear:
        d(x,s) + w + d(t,y) == d(x,y) over the pre-deletion table,
        with d(v,v) = 0 supplied for the endpoint cases. Two hash
        joins; output is the affected pairs only.

        Under ``sources`` restriction the table holds no suffix
        distances d(t, y) for non-source t, so the pair-level test
        cannot be evaluated; the over-approximation coarsens to the
        SOURCE level — every pair of a source whose tree reaches a
        removed edge's tail (d(x, s) exists, or x == s) is deleted and
        that source's tree re-derived. Work is the affected sources'
        trees, still never the whole state."""

        val = self.val
        if self.sources is not None:
            reaches_tail = (
                self.dist.join(
                    rem_w.select("s"),
                    self.dist["y"] == rem_w["s"],
                    "left_semi",
                )
                .select("x")
                .distinct()
            )
            is_tail = (
                self.dist.select("x")
                .distinct()
                .join(
                    rem_w.select(F.col("s").alias("x")).distinct(),
                    "x",
                    "left_semi",
                )
            )
            aff_src = reaches_tail.unionByName(is_tail).distinct()
            return (
                self.dist.join(aff_src, "x", "left_semi")
                .select("x", "y")
                .distinct()
            )

        zero = F.lit(0.0) if self.weighted else F.lit(0)
        zeros_x = (
            self.dist.select(F.col("x").alias("v"))
            .unionByName(self.edges.select(F.col("s").alias("v")))
            .distinct()
            .select(F.col("v").alias("x"), F.col("v").alias("y"),
                    zero.alias(val))
        )
        zeros_y = (
            self.dist.select(F.col("y").alias("v"))
            .unionByName(self.edges.select(F.col("t").alias("v")))
            .distinct()
            .select(F.col("v").alias("x"), F.col("v").alias("y"),
                    zero.alias(val))
        )
        dplus_pre = self.dist.unionByName(zeros_x)   # prefixes d(x, s)
        dplus_suf = self.dist.unionByName(zeros_y)   # suffixes d(t, y)
        pre = dplus_pre.select(
            F.col("x"), F.col("y").alias("s"), F.col(val).alias("d1")
        )
        suf = dplus_suf.select(
            F.col("x").alias("t"), F.col("y"), F.col(val).alias("d2")
        )
        through = (
            pre.join(rem_w, "s")
            .join(suf, "t")
            .select(
                "x", "y",
                (F.col("d1") + F.col("w") + F.col("d2")).alias("d"),
            )
        )
        # Weighted costs are float sums whose grouping differs between
        # the maintained value and the prefix+w+suffix decomposition;
        # a small tolerance keeps the over-approximation SOUND (extra
        # marked pairs re-derive to the same value, missed pairs would
        # keep a stale cost). The tolerance is RELATIVE: double sums
        # near 1e7+ (or long paths) accumulate more than 1e-9 of
        # absolute error, and an absolute bound would silently miss an
        # affected pair — the stale-cost direction. Unweighted hops
        # compare exactly.
        if self.weighted:
            cond = F.abs(F.col(val) - F.col("d")) <= F.lit(1e-9) * F.greatest(
                F.lit(1.0), F.abs(F.col(val))
            )
        else:
            cond = F.col(val) == F.col("d")
        return (
            self.dist.join(through, ["x", "y"])
            .filter(cond)
            .select("x", "y")
            .distinct()
        )

    def apply(
        self,
        added: Optional[DataFrame] = None,
        retracted: Optional[DataFrame] = None,
    ) -> DataFrame:
        """One epoch: apply edge additions/retractions, advance the
        maintained table, return weighted diffs (x, y, val, diff)."""

        val = self.val
        add = self._norm_add(added)
        rem = self._norm_rem(retracted)
        old_dist = self.dist
        old_edges = self.edges

        if rem is not None:
            # inner join both restricts rem to stored edges AND
            # attaches their weight: (s, t, w) actually removed
            rem_w = rem.join(old_edges, ["s", "t"]).localCheckpoint(
                eager=True
            )
            if rem_w.limit(1).isEmpty():
                rem = rem_w = None
        else:
            rem_w = None
        base_edges = old_edges
        if rem is not None:
            base_edges = base_edges.join(rem, ["s", "t"], "left_anti")
        if add is not None:
            # effective additions: new pairs, or strictly lower weight
            # than the (post-retraction) stored edge.
            add = (
                add.join(
                    base_edges.select(
                        "s", "t", F.col("w").alias("__wb")
                    ),
                    ["s", "t"], "left",
                )
                .filter(F.col("__wb").isNull() | (F.col("w") < F.col("__wb")))
                .select("s", "t", "w")
                .localCheckpoint(eager=True)
            )
            if add.limit(1).isEmpty():
                add = None
        new_edges = base_edges
        if add is not None:
            new_edges = (
                new_edges.unionByName(add)
                .groupBy("s", "t")
                .agg(F.min("w").alias("w"))
            )
        new_edges = new_edges.localCheckpoint(eager=True)

        # -- delete phase (DRed over-delete) --
        if rem_w is not None:
            affected = self._affected(rem_w).localCheckpoint(eager=True)
            surviving = old_dist.join(
                affected, ["x", "y"], "left_anti"
            ).localCheckpoint(eager=True)
        else:
            affected = None
            surviving = old_dist

        # -- seeds: candidates whose derivation touches the change --
        seeds = []
        if add is not None:
            direct = add.select(
                F.col("s").alias("x"), F.col("t").alias("y"),
                F.col("w").alias(val),
            )
            if self.sources is not None:
                direct = direct.join(
                    self.sources.select(F.col("s").alias("x")), "x"
                )
            seeds.append(direct)
            seeds.append(  # maintained prefix + improving edge
                surviving.join(add, surviving["y"] == add["s"]).select(
                    "x", F.col("t").alias("y"),
                    (F.col(val) + F.col("w")).alias(val),
                )
            )
        if affected is not None:
            # re-derivation base: edges and surviving-prefix extensions
            # landing in the affected region.
            base = new_edges.select(
                F.col("s").alias("x"), F.col("t").alias("y"),
                F.col("w").alias(val),
            ).join(affected, ["x", "y"], "left_semi")
            seeds.append(base)
            seeds.append(
                surviving.join(new_edges, surviving["y"] == new_edges["s"])
                .select(
                    "x", F.col("t").alias("y"),
                    (F.col(val) + F.col("w")).alias(val),
                )
                .join(affected, ["x", "y"], "left_semi")
            )
        if not seeds:
            self.edges = new_edges
            return old_dist.limit(0).withColumn("diff", F.lit(1))

        cand0 = seeds[0]
        for s in seeds[1:]:
            cand0 = cand0.unionByName(s)
        cand0 = cand0.groupBy("x", "y").agg(F.min(val).alias(val))
        # improvements vs surviving state only
        delta = (
            cand0.join(
                surviving.select("x", "y", F.col(val).alias("__h")),
                ["x", "y"], "left",
            )
            .filter(F.col("__h").isNull() | (F.col(val) < F.col("__h")))
            .select("x", "y", val)
            .localCheckpoint(eager=True)
        )
        dist = (
            surviving.unionByName(delta)
            .groupBy("x", "y")
            .agg(F.min(val).alias(val))
            .localCheckpoint(eager=False)
        )

        # -- same delta relaxation as the batch operators --
        for _ in range(self.max_iters):
            if delta.limit(1).isEmpty():
                break
            cand = delta.join(new_edges, delta["y"] == new_edges["s"]).select(
                "x", F.col("t").alias("y"),
                (F.col(val) + F.col("w")).alias(val),
            )
            merged = (
                dist.unionByName(cand)
                .groupBy("x", "y")
                .agg(F.min(val).alias(val))
                .localCheckpoint(eager=False)
            )
            delta = merged.join(
                dist, ["x", "y", val], "left_anti"
            ).localCheckpoint(eager=True)
            dist = merged
        else:
            raise RuntimeError(
                f"incremental shortest paths did not converge in "
                f"{self.max_iters} rounds"
            )

        dist = dist.localCheckpoint(eager=True)
        removed_rows = old_dist.exceptAll(dist).withColumn("diff", F.lit(-1))
        added_rows = dist.exceptAll(old_dist).withColumn("diff", F.lit(1))
        self.dist = dist
        self.edges = new_edges
        return removed_rows.unionByName(added_rows)


class IncrementalShortestHops(IncrementalShortestPaths):
    """Unweighted form: every edge costs one hop (output column
    ``hops``). Kept as its own name because it is the maintained twin
    of the ``shortest_hops`` batch operator and the declared
    ``shortest_hops`` query."""

    def __init__(
        self,
        edges: DataFrame,
        src: str = "src",
        dst: str = "dst",
        sources: Optional[DataFrame] = None,
        max_iters: int = 100,
    ) -> None:
        super().__init__(
            edges, src=src, dst=dst, cost=None, sources=sources,
            max_iters=max_iters,
        )


class IncrementalCC:
    """Incrementally-maintained connected components over a changing
    undirected edge set — the maintained twin of
    ``operators/dedup.py::connected_components`` (and hence of the
    declared ``graph_cc`` / ``dedup_groups`` pairs→clusters step).

    CC is not a per-key aggregate — one edge can merge or split
    label sets spanning many vertices — so the maintenance unit is
    the COMPONENT, not the key:

    - affected components = the maintained labels of every endpoint
      touched by the epoch's delta (adds and retracts alike);
    - the affected SUBGRAPH is the surviving edges with an endpoint
      in those components (old components are closed under old edges,
      and a new edge's endpoints are touched by construction, so the
      one-sided semi-join covers every relevant edge);
    - the batch operator recomputes labels on that subgraph only —
      merges (an add bridging two components) and splits (a retract
      disconnecting one) both fall out of the recompute, no DRed
      bookkeeping — and new-minus-old on the restricted labelings is
      the epoch's ± diff stream. Unaffected components are never
      read, never recomputed, never re-emitted.

    Work per epoch is O(delta + affected components' edges). Edge
    semantics are SET semantics, exactly the batch operator's
    (it distincts its input): re-adding a present edge is a no-op and
    a retract removes the edge outright; when one epoch adds and
    retracts the same edge, the retract wins. State (edge set +
    labels) is localCheckpointed per epoch; ``current()`` is the
    maintained labeling, gated equal to the batch operator on the
    surviving edges in test_incremental.py.
    """

    def __init__(
        self,
        edges: DataFrame,
        src: str = "src",
        dst: str = "dst",
        max_iters: int = 25,
        step: int = 6,
    ) -> None:
        from ..operators.dedup import connected_components

        self.max_iters = max_iters
        self.step = step
        self.edges = (
            self._norm(edges.select(F.col(src), F.col(dst)))
            .localCheckpoint(eager=True)
        )
        self.labels = connected_components(
            self.edges, "u", "v", max_iters=max_iters, step=step
        ).localCheckpoint(eager=True)

    @staticmethod
    def _norm(df: DataFrame) -> DataFrame:
        """(u, v) with u <= v, distinct — undirected set form; takes
        the frame's first two columns as endpoints."""

        a, b = df.columns[:2]
        return df.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        ).distinct()

    def current(self) -> DataFrame:
        return self.labels

    def apply(
        self,
        added: Optional[DataFrame] = None,
        retracted: Optional[DataFrame] = None,
    ) -> DataFrame:
        from ..operators.dedup import connected_components

        spark = self.edges.sparkSession
        empty_pairs = spark.createDataFrame([], self.edges.schema)
        add_e = self._norm(added) if added is not None else empty_pairs
        ret_e = (
            self._norm(retracted) if retracted is not None else empty_pairs
        )
        new_edges = (
            self.edges.unionByName(add_e)
            .distinct()
            .join(ret_e, ["u", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        delta_verts = (
            add_e.select(F.col("u").alias("id"))
            .unionByName(add_e.select(F.col("v").alias("id")))
            .unionByName(ret_e.select(F.col("u").alias("id")))
            .unionByName(ret_e.select(F.col("v").alias("id")))
            .distinct()
        )
        touched_comps = (
            self.labels.join(delta_verts, "id", "left_semi")
            .select("component")
            .distinct()
        )
        old_sub = self.labels.join(
            touched_comps, "component", "left_semi"
        ).localCheckpoint(eager=True)
        affected = (
            old_sub.select("id").unionByName(delta_verts).distinct()
        )
        sub_edges = new_edges.join(
            affected.withColumnRenamed("id", "u"), "u", "left_semi"
        )
        new_sub = connected_components(
            sub_edges, "u", "v", max_iters=self.max_iters, step=self.step
        ).localCheckpoint(eager=True)
        diffs = (
            old_sub.select("id", "component", F.lit(-1).alias("diff"))
            .unionByName(
                new_sub.select("id", "component", F.lit(1).alias("diff"))
            )
            .groupBy("id", "component")
            .agg(F.sum("diff").alias("diff"))
            .filter(F.col("diff") != 0)
            .localCheckpoint(eager=True)
        )
        self.labels = (
            self.labels.join(old_sub, "id", "left_anti")
            .unionByName(new_sub)
            .localCheckpoint(eager=True)
        )
        self.edges = new_edges
        return diffs


class IncrementalPageRank:
    """Incrementally-maintained PageRank with the batch operator's
    exact semantics (operators/graph.py::pagerank): fixed ``iters``
    iterations, per-iteration rounding to ``scale`` decimals, dangling
    nodes keep the random-jump term.

    Fixed-iteration PageRank is NOT a lattice fixpoint (rank changes
    are not monotone), so the shortest-paths delta relaxation does not
    apply. Instead the maintainer stores the PER-ITERATION rank tables
    pr_0..pr_iters and, per epoch of edge additions/retractions,
    re-evaluates each level ONLY on its affected frontier:

    - structurally affected (every level): targets of added/removed
      edges, plus out-neighbors of any node whose out-degree changed
      (their contribution term rank/deg changes at every level);
    - dynamically affected (level i): out-neighbors (under the new
      edge set) of nodes whose level i-1 rank actually CHANGED after
      rounding — rounding collapses far-field perturbations, so the
      frontier typically shrinks instead of flooding the graph.

    Each level recomputes ``in_sum`` only for frontier nodes (the join
    e ⋈ frontier restricts to their full in-neighborhoods) against the
    stored previous-level ranks overridden by that level's changes —
    work proportional to affected neighborhoods, never an edge-set
    scan. Changing the NODE SET changes N (hence the base term of
    every node), so such epochs fall back to a full rebuild —
    ``last_epoch_mode`` reports 'incremental' | 'rebuild' | 'noop' so
    callers (and the gate) can see which path ran.

    State: iters+1 rank tables of |V| rows plus edges and out-degrees,
    localCheckpointed per epoch. ``apply`` returns weighted diffs
    (node, rank, diff); ``current`` equals the batch operator on the
    current edge set (gated in test_incremental.py).
    """

    def __init__(
        self,
        edges: DataFrame,
        src: str = "src",
        dst: str = "dst",
        iters: int = 10,
        damping: float = 0.85,
        scale: int = 6,
    ) -> None:
        self.iters = iters
        self.damping = damping
        self.scale = scale
        self.edges = (
            edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        self.last_epoch_mode: Optional[str] = None
        self._full_build()

    # -- batch-identical level construction --------------------------

    def _full_build(self) -> None:
        """(Re)build nodes, out-degrees, and the per-level rank tables
        with the batch operator's exact (decimal-sum, order-
        independent) arithmetic — graph.py::PR_CONTRIB_SQL /
        pr_rank_sql, so maintained levels and batch recomputation
        agree bit-for-bit."""

        from ..operators.graph import PR_CONTRIB_SQL, pr_rank_sql

        e = self.edges
        self.nodes = (
            e.select(F.col("s").alias("node"))
            .unionByName(e.select(F.col("t").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        self.n = self.nodes.count()
        self.outdeg = (
            e.groupBy(F.col("s").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        self._base = (
            f"{round((1.0 - self.damping) / self.n, self.scale):.{self.scale}f}"
        )
        pr = self.nodes.select(
            "node", F.lit(round(1.0 / self.n, self.scale)).alias("rank")
        ).localCheckpoint(eager=True)
        self.prs = [pr]
        for _ in range(self.iters):
            contrib = (
                pr.join(self.outdeg, "node")
                .join(e, pr["node"] == e["s"])
                .select(
                    F.col("t").alias("node"),
                    F.expr(
                        PR_CONTRIB_SQL.format(rank="rank", deg="deg")
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("in_sum"))
            )
            pr = (
                self.nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    F.expr(
                        pr_rank_sql(self._base, self.damping, self.scale)
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            self.prs.append(pr)

    def current(self) -> DataFrame:
        return self.prs[-1]

    @staticmethod
    def _norm(df: Optional[DataFrame]) -> Optional[DataFrame]:
        if df is None:
            return None
        a, b = df.columns[0], df.columns[1]
        return df.select(F.col(a).alias("s"), F.col(b).alias("t")).distinct()

    def _diffs(self, old_final: DataFrame, new_final: DataFrame) -> DataFrame:
        """Weighted diffs between two rank tables: retract the old
        value and assert the new one for every node whose rank moved
        (node-set changes emit one-sided rows)."""

        o = old_final.select("node", F.col("rank").alias("old_rank"))
        nw = new_final.select("node", F.col("rank").alias("new_rank"))
        j = o.join(nw, "node", "full_outer")
        changed = j.filter(
            ~(F.col("old_rank").eqNullSafe(F.col("new_rank")))
        )
        retracts = changed.filter(F.col("old_rank").isNotNull()).select(
            "node",
            F.col("old_rank").alias("rank"),
            F.lit(-1).cast("long").alias("diff"),
        )
        asserts = changed.filter(F.col("new_rank").isNotNull()).select(
            "node",
            F.col("new_rank").alias("rank"),
            F.lit(1).cast("long").alias("diff"),
        )
        return retracts.unionByName(asserts)

    def apply(
        self,
        added: Optional[DataFrame] = None,
        retracted: Optional[DataFrame] = None,
    ) -> DataFrame:
        """One epoch of edge additions/retractions; returns weighted
        diffs (node, rank, diff) of the FINAL level."""

        add = self._norm(added)
        rem = self._norm(retracted)
        old_edges = self.edges
        old_final = self.prs[-1]

        # Effective change sets (no-op adds/removes drop out).
        add_eff = (
            add.join(old_edges, ["s", "t"], "left_anti").localCheckpoint(
                eager=True
            )
            if add is not None
            else None
        )
        if add_eff is not None and add_eff.limit(1).isEmpty():
            add_eff = None
        rem_eff = (
            rem.join(old_edges, ["s", "t"]).localCheckpoint(eager=True)
            if rem is not None
            else None
        )
        if rem_eff is not None and rem_eff.limit(1).isEmpty():
            rem_eff = None
        if add_eff is None and rem_eff is None:
            self.last_epoch_mode = "noop"
            return self._diffs(old_final, old_final)

        new_edges = old_edges
        if rem_eff is not None:
            new_edges = new_edges.join(rem_eff, ["s", "t"], "left_anti")
        if add_eff is not None:
            new_edges = new_edges.unionByName(add_eff)
        self.edges = new_edges.localCheckpoint(eager=True)

        # Node-set change => N changes => every node's base term and
        # seed rank change: rebuild (the well-defined fallback).
        new_nodes = (
            self.edges.select(F.col("s").alias("node"))
            .unionByName(self.edges.select(F.col("t").alias("node")))
            .distinct()
        )
        node_delta = new_nodes.join(
            self.nodes, "node", "full_outer"
        ).count() != self.n or new_nodes.count() != self.n
        if node_delta:
            self.last_epoch_mode = "rebuild"
            self._full_build()
            return self._diffs(old_final, self.prs[-1])

        old_outdeg = self.outdeg
        self.outdeg = (
            self.edges.groupBy(F.col("s").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        deg_changed = (
            self.outdeg.join(
                old_outdeg.withColumnRenamed("deg", "old_deg"),
                "node",
                "full_outer",
            )
            .filter(~F.col("deg").eqNullSafe(F.col("old_deg")))
            .select("node")
        )

        # Structurally affected at EVERY level: endpoints of changed
        # in-edges plus out-neighbors (new edge set) of deg-changed
        # nodes.
        parts = [
            self.edges.join(
                deg_changed.withColumnRenamed("node", "s"), "s"
            ).select(F.col("t").alias("node"))
        ]
        if add_eff is not None:
            parts.append(add_eff.select(F.col("t").alias("node")))
        if rem_eff is not None:
            parts.append(rem_eff.select(F.col("t").alias("node")))
        d_struct = parts[0]
        for p in parts[1:]:
            d_struct = d_struct.unionByName(p)
        d_struct = d_struct.distinct().localCheckpoint(eager=True)

        from ..operators.graph import PR_CONTRIB_SQL, pr_rank_sql

        e = self.edges
        changed: Optional[DataFrame] = None  # (node, new_rank) at i-1
        new_prs = [self.prs[0]]  # level 0 is uniform; N unchanged
        for i in range(1, self.iters + 1):
            frontier = d_struct
            if changed is not None:
                dyn = e.join(
                    changed.select(F.col("node").alias("s")), "s"
                ).select(F.col("t").alias("node"))
                frontier = frontier.unionByName(dyn).distinct()
            # Previous-level ranks = stored table overridden by the
            # previous level's changes (only in-neighbors of the
            # frontier are ever read).
            prev = self.prs[i - 1]
            if changed is not None:
                prev = (
                    prev.join(
                        F.broadcast(
                            changed.withColumnRenamed("new_rank", "__nr")
                        ),
                        "node",
                        "left",
                    )
                    .select(
                        "node",
                        F.coalesce(F.col("__nr"), F.col("rank")).alias(
                            "rank"
                        ),
                    )
                )
            in_e = e.join(
                frontier.withColumnRenamed("node", "t"), "t"
            )  # (s, t) edges INTO the frontier
            contrib = (
                in_e.join(
                    prev.withColumnRenamed("node", "s"), "s"
                )
                .join(self.outdeg.withColumnRenamed("node", "s"), "s")
                .select(
                    F.col("t").alias("node"),
                    F.expr(
                        PR_CONTRIB_SQL.format(rank="rank", deg="deg")
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("in_sum"))
            )
            new_vals = (
                frontier.join(contrib, "node", "left")
                .select(
                    "node",
                    F.expr(
                        pr_rank_sql(self._base, self.damping, self.scale)
                    ).alias("new_rank"),
                )
            )
            changed = (
                new_vals.join(self.prs[i], "node")
                .filter(F.col("new_rank") != F.col("rank"))
                .select("node", "new_rank")
                .localCheckpoint(eager=True)
            )
            if changed.limit(1).isEmpty():
                changed = None
                new_pr = self.prs[i]
            else:
                new_pr = (
                    self.prs[i]
                    .join(F.broadcast(changed), "node", "left")
                    .select(
                        "node",
                        F.coalesce(
                            F.col("new_rank"), F.col("rank")
                        ).alias("rank"),
                    )
                    .localCheckpoint(eager=True)
                )
            new_prs.append(new_pr)
        self.prs = new_prs
        self.last_epoch_mode = "incremental"
        return self._diffs(old_final, self.prs[-1])


class IncrementalEdgeSupport:
    """Maintained per-edge triangle support (the k-truss measure,
    operators/graph.py::edge_triangle_support) under streaming edge
    adds AND retractions — the graph twin of the touched-key
    maintainers: a delta edge {a, b} changes N(a) and N(b) ONLY, so
    support can move only for edges INCIDENT to a or b, and the epoch
    recounts exactly those through the shared batch core
    (graph.support_of — wedge joins over the FULL adjacency state,
    canon restricted to the touched edges), so maintained and batch
    semantics cannot drift. Emits (a, b, support, diff) with -1
    retracting an edge's previous support row and +1 asserting the new
    one; an untouched edge emits nothing.

    Per-epoch compute is O(batch + sum of touched endpoints' degrees)
    — never a full-graph triangle recount; state is the signed
    canonical edge multiset on the generational parquet machinery
    (epoch-keyed retry-idempotent appends, folded-epoch manifests,
    periodic compaction — the _GenerationalState contract)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        src: str = "src",
        dst: str = "dst",
    ) -> None:
        from .corpus_stats import _GenerationalState

        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.src = src
        self.dst = dst
        # borrow the generational state io verbatim (composition, not
        # inheritance: KEY_COL/_read_counts don't apply here)
        self._gs = _GenerationalState()
        self._gs.spark = spark
        self._gs.state_dir = self.state_dir
        self.compact_every = self._gs.compact_every

    # -- state ---------------------------------------------------------
    def _project(self, edges: DataFrame) -> DataFrame:
        return edges.select(
            F.least(F.col(self.src), F.col(self.dst)).alias("a"),
            F.greatest(F.col(self.src), F.col(self.dst)).alias("b"),
        ).filter(F.col("a") != F.col("b"))

    def _edges_state(self) -> Optional[DataFrame]:
        inc = self._gs._read_versioned("edges")
        if inc is None:
            return None
        return (
            inc.groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .select("a", "b")
        )

    @staticmethod
    def _und(canon: DataFrame) -> DataFrame:
        return canon.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).union(
            canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )

    def current(self) -> Optional[DataFrame]:
        """The full maintained result recomputed from state — the
        equality-gate read; per-epoch diffs never take this path."""

        from ..operators.graph import support_of

        st = self._edges_state()
        if st is None:
            return None
        st = st.localCheckpoint(eager=False)
        return support_of(self._und(st).localCheckpoint(eager=False), st)

    # -- epochs ----------------------------------------------------------
    def _restricted(
        self, st: Optional[DataFrame], touched: DataFrame
    ) -> Optional[DataFrame]:
        from ..operators.graph import support_of

        if st is None:
            return None
        st = st.localCheckpoint(eager=False)
        # re-select (a, b) after each semijoin: a string-key join puts
        # the JOIN KEY first, so a positional union of the "a"-keyed
        # and "b"-keyed sides would swap pairs.
        t_a = st.join(
            touched.withColumnRenamed("node", "a"), "a", "left_semi"
        ).select("a", "b")
        t_b = st.join(
            touched.withColumnRenamed("node", "b"), "b", "left_semi"
        ).select("a", "b")
        tc = t_a.union(t_b).distinct()
        return support_of(self._und(st).localCheckpoint(eager=False), tc)

    def process_batch(
        self,
        adds: Optional[DataFrame] = None,
        retracts: Optional[DataFrame] = None,
        epoch: Optional[int] = None,
    ) -> Optional[DataFrame]:
        delta = None
        if adds is not None:
            delta = self._project(adds).select(
                "a", "b", F.lit(1).alias("cnt")
            )
        if retracts is not None:
            neg = self._project(retracts).select(
                "a", "b", F.lit(-1).alias("cnt")
            )
            delta = neg if delta is None else delta.unionByName(neg)
        if delta is None:
            return None
        delta = (
            delta.groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") != 0)
            .localCheckpoint(eager=True)
        )
        touched = (
            delta.select(F.col("a").alias("node"))
            .union(delta.select(F.col("b").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        before = self._edges_state()
        # Materialize the OLD restricted result BEFORE the append: a
        # retried epoch overwrites its own partition in place and a
        # lazy plan would list the replaced files.
        old = self._restricted(before, touched)
        if old is not None:
            old = old.localCheckpoint(eager=True)
        self._gs._append("edges", delta, epoch=epoch)
        self._epochs = getattr(self, "_epochs", 0) + 1
        if self._epochs % self.compact_every == 0:
            inc = self._gs._read_versioned("edges")
            if inc is not None:
                self._gs._compact(
                    "edges",
                    inc.groupBy("a", "b")
                    .agg(F.sum("cnt").alias("cnt"))
                    .filter(F.col("cnt") != 0),
                )
        new = self._restricted(self._edges_state(), touched)

        def tag(df: Optional[DataFrame], w: int) -> Optional[DataFrame]:
            if df is None:
                return None
            return df.select("a", "b", "support", F.lit(w).alias("diff"))

        olds, news = tag(old, -1), tag(new, 1)
        if olds is None and news is None:
            return None
        both = news if olds is None else (
            olds if news is None else olds.unionByName(news)
        )
        return (
            both.groupBy("a", "b", "support")
            .agg(F.sum("diff").alias("diff"))
            .filter(F.col("diff") != 0)
        )
