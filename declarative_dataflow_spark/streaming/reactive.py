"""ReactiveSession: the reference's end-to-end contract — clients
transact datoms and receive incrementally-maintained result diffs for
every registered interest (README.md:12-23; server loop
server/src/main.rs:588-656).

Spark-first realization: each transaction advances the epoch
(micro-batch analog). Conjunctive rules (Hector over attribute /
constant / predicate / antijoin bindings) are maintained
INCREMENTALLY via DeltaJoin — per-epoch work tracks the change, the
reference's delta-pipeline behavior. Every other rule is re-evaluated
through the engine's Catalyst-compiled plan and diffed against the
previous epoch's snapshot with a distributed exceptAll — no
driver-side relation state. For the streaming-source path the same
diffing runs inside foreachBatch (see diff_sink).

Scale notes: snapshots are cached DataFrames (swap for Delta tables at
very large results); re-evaluation cost is one Catalyst job per epoch,
which AQE sizes to the actual data.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from ..engine import Datom, Engine
from .diff_sink import DEFAULT_HISTORY_LIMIT, record_bounded


@dataclass
class Interest:
    """A subscription to a rule's result diffs
    (reference: Interest request, src/server/mod.rs:109-119).

    ``history`` buffers collected diffs only when no callback consumes
    them, bounded to the newest ``history_limit`` epochs (the reference
    streams diffs out and keeps nothing — an unbounded driver-side
    list would OOM on a long-lived high-churn subscription);
    ``on_evict`` spills entries leaving the window."""

    name: str
    callback: Optional[Callable[[DataFrame, int], None]] = None
    previous: Optional[DataFrame] = None
    history: "deque[tuple[int, list]]" = field(
        default_factory=lambda: deque(maxlen=DEFAULT_HISTORY_LIMIT)
    )
    on_evict: Optional[Callable[[int, list], None]] = None
    delta_join: Optional[object] = None  # incremental path, if eligible
    # True when the DeltaJoin was (re)seeded inside the current advance,
    # i.e. AFTER engine.transact — its snapshots already contain this
    # epoch's datoms, so the replay path must not transact them again.
    seeded_post_transact: bool = False
    # Output batching: emit coalesced diffs every `granularity` epochs
    # (the reference's delay+coarsen, server/src/main.rs:482-490).
    granularity: int = 1
    pending: list[DataFrame] = field(default_factory=list)


def _delta_join_for(engine: Engine, name: str):
    """Build the incremental maintainer for a rule: a DeltaJoin for
    conjunctive (Hector) rules, an IncrementalAggregate for a
    single-function Aggregate over one; None if ineligible."""

    from ..plan.plans import (
        Aggregate as AggregatePlan,
        Hector,
        NameExpr as NameExprPlan,
        TopK as TopKPlan,
    )
    from .incremental import DeltaJoin, IncrementalAggregate

    plan = engine.rules[name]
    if (
        isinstance(plan, TopKPlan)
        and isinstance(plan.plan, Hector)
        # The maintainer emits the inner conjunction's variable order;
        # only route when the TopK projects exactly that.
        and list(plan.variables_) == list(plan.plan.variables_)
    ):
        from .incremental import IncrementalTopK

        inner = _delta_join_for_plan(engine, plan.plan)
        if inner is None:
            return None
        return IncrementalTopK(
            inner,
            [(str(v), bool(asc)) for v, asc in plan.order_by],
            plan.k,
            [str(v) for v in plan.partition_by],
            seed_from_snapshots=True,
        )
    if (
        isinstance(plan, AggregatePlan)
        and isinstance(plan.plan, Hector)
        and len(plan.aggregation_fns) == 1
        and not plan.exact
    ):
        inner = _delta_join_for_plan(engine, plan.plan)
        if inner is None:
            return None
        try:
            return IncrementalAggregate(
                inner,
                list(plan.key_variables),
                plan.aggregation_fns[0],
                plan.aggregation_variables[0],
                seed_from_snapshots=True,
            )
        except ValueError:
            return None
    if (
        isinstance(plan, AggregatePlan)
        and isinstance(plan.plan, NameExprPlan)
        and len(plan.aggregation_fns) == 1
        and not plan.exact
    ):
        # Differential reduce over an iterate: aggregate over a
        # recursive rule chains IncrementalAggregate onto the
        # maintained fixpoint (reference: aggregates sit on
        # differential reduce over any collection, including Variables
        # inside the iterative scope).
        from .incremental import RenamedMaintainer, incremental_recursion_for

        target = plan.plan.name
        if target in engine.rules:
            needed = {str(v) for v in plan.key_variables} | {
                str(plan.aggregation_variables[0])
            }
            names = [str(v) for v in plan.plan.variables_]
            if needed <= set(names):
                wrapped = None
                inner = incremental_recursion_for(engine, target)
                if inner is not None:
                    wrapped = RenamedMaintainer(inner, names)
                elif not engine._recursive_rules(target):
                    # Non-recursive named view: flatten to Hector and
                    # delta-track like an inline conjunction.
                    tplan = engine.rules[target]
                    opt = (
                        tplan
                        if isinstance(tplan, Hector)
                        else engine.optimized(tplan)
                    )
                    if isinstance(opt, Hector):
                        dj = _delta_join_for_plan(engine, opt)
                        if dj is not None and len(dj.variables) == len(names):
                            wrapped = RenamedMaintainer(
                                dj, names, source_vars=dj.variables
                            )
                if wrapped is not None:
                    try:
                        return IncrementalAggregate(
                            wrapped,
                            list(plan.key_variables),
                            plan.aggregation_fns[0],
                            plan.aggregation_variables[0],
                            seed_from_snapshots=True,
                        )
                    except ValueError:
                        return None
        return None
    if not isinstance(plan, Hector):
        # Conjunctive plans (nested Joins etc.) flatten to one Hector
        # (implement_neu, engine.optimized) and delta-track as such.
        opt = engine.optimized(plan)
        if isinstance(opt, Hector):
            return _delta_join_for_plan(engine, opt)
        # Recursive rules: DRed-style incremental maintenance (the
        # reference maintains recursion inside its differential scope,
        # src/lib.rs:943-1019).
        from .incremental import incremental_recursion_for

        return incremental_recursion_for(engine, name)
    return _delta_join_for_plan(engine, plan)


def _delta_join_for_plan(engine: Engine, plan):
    """DeltaJoin over a Hector plan's bindings, seeded from the current
    transacted-attribute snapshots (RAW semantics only)."""

    from .incremental import DeltaJoin
    from ..plan.plans import (
        AntijoinBinding,
        AttributeBinding,
        BinaryPredicateBinding,
        ConstantBinding,
    )

    from ..engine import InputSemantics

    aids = set()
    for b in plan.bindings:
        if isinstance(b, (AttributeBinding, AntijoinBinding)):
            ta = engine._transacted.get(b.attribute)
            if ta is None:
                return None
            aids.add(b.attribute)
        elif not isinstance(b, (ConstantBinding, BinaryPredicateBinding)):
            return None
    from .incremental import SemanticsDeltaSource

    initial = {}
    semantics = {}
    for aid in aids:
        ta = engine._transacted[aid]
        if ta.config.input_semantics != InputSemantics.RAW:
            # LWW/Distinct rewrite history at ingest; an adapter turns
            # raw datom batches into effective-view deltas so the
            # pipelines still consume a plain weighted delta.
            adapter = SemanticsDeltaSource(ta)
            semantics[aid] = adapter
            snap = adapter.initial()
            if not snap.isEmpty():
                initial[aid] = snap
            continue
        df = ta.dataframe()
        if not df.isEmpty():
            initial[aid] = df.select("e", "v", "diff")
    return DeltaJoin(
        engine.spark, plan.variables_, plan.bindings, initial, semantics
    )


def _coalesce_diffs(dfs: list[DataFrame]) -> DataFrame:
    """Coarsen a window of per-epoch diff frames into one consolidated
    batch: net weight per tuple, zero-net tuples (asserted then
    retracted inside the window) vanish — the reference's
    delay(coarsen) + consolidate (server/src/main.rs:482-490)."""

    normalized = []
    cols: list[str] = []
    for df in dfs:
        cols = [c for c in df.columns if c not in ("diff", "__epoch_diff")]
        net = (
            F.col("diff") * F.col("__epoch_diff")
            if "diff" in df.columns
            else F.col("__epoch_diff")
        )
        normalized.append(df.select(*cols, net.alias("__net")))
    out = normalized[0]
    for df in normalized[1:]:
        out = out.unionByName(df)
    return (
        out.groupBy(*cols)
        .agg(F.sum("__net").alias("diff"))
        .filter(F.col("diff") != 0)
        .withColumn("__epoch_diff", F.lit(1))
    )


class ReactiveSession:
    """Transact -> advance -> emit diffs, per registered interest."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.interests: dict[str, Interest] = {}
        self.epoch = 0

    def interest(
        self,
        name: str,
        callback: Optional[Callable[[DataFrame, int], None]] = None,
        incremental: bool = True,
        granularity: int = 1,
        history_limit: int = DEFAULT_HISTORY_LIMIT,
        on_evict: Optional[Callable[[int, list], None]] = None,
    ) -> None:
        if name not in self.engine.rules:
            raise KeyError(f"unknown rule {name}")
        dj = _delta_join_for(self.engine, name) if incremental else None
        self.interests[name] = Interest(
            name,
            callback,
            history=deque(maxlen=max(1, history_limit)),
            on_evict=on_evict,
            delta_join=dj,
            granularity=max(1, granularity),
        )

    def uninterest(self, name: str) -> None:
        """Tear down a subscription (reference: Uninterest +
        ShutdownHandle, src/server/mod.rs:475-488)."""

        sub = self.interests.pop(name, None)
        if sub is not None and isinstance(sub.previous, DataFrame):
            sub.previous.unpersist()

    def transact(self, datoms: Iterable[Datom]) -> int:
        """Append a transaction and advance the domain: emit diffs for
        every interest — incrementally for DeltaJoin-backed rules,
        recompute + exceptAll otherwise."""

        datoms = list(datoms)
        self.engine.transact(datoms)
        return self.advance(datoms)

    def advance(self, datoms: Optional[list[Datom]] = None) -> int:
        epoch = self.epoch
        for sub in self.interests.values():
            if sub.delta_join is None and sub.previous is None:
                # Attributes may appear after subscription; until the
                # first successful epoch, keep probing for the
                # incremental path. A DeltaJoin built here is seeded
                # from snapshots that already include this epoch's
                # datoms (engine.transact ran first).
                sub.delta_join = _delta_join_for(self.engine, sub.name)
                sub.seeded_post_transact = sub.delta_join is not None
            if sub.delta_join is not None:
                diffs = self._advance_incremental(sub, datoms or [])
            else:
                diffs = self._advance_recompute(sub)
            if sub.granularity > 1:
                sub.pending.append(diffs)
                if (epoch + 1) % sub.granularity != 0:
                    continue
                diffs = _coalesce_diffs(sub.pending)
                sub.pending = []
            if sub.callback is not None:
                sub.callback(diffs, epoch)
            else:
                record_bounded(
                    sub.history, sub.on_evict, epoch, diffs.collect()
                )
        self.epoch += 1
        # The reference advances domain traces as the frontier moves
        # (advance_traces, src/domain/mod.rs:291-341): attributes with
        # trace_slack compact history older than frontier - slack.
        self.engine.advance_traces()
        return epoch

    def _advance_incremental(
        self, sub: Interest, datoms: list[Datom]
    ) -> DataFrame:
        """Delta-pipeline path: per-epoch work tracks the change. On
        the first advance the current state replays as +1 diffs (the
        reference replays the arrangement on subscription); the
        weighted change rides in `diff`, `__epoch_diff` stays +1."""

        if sub.previous is None:
            sub.previous = True  # replay marker
            # Consume this epoch's datoms so they are not re-applied —
            # unless the maintainer was seeded post-transact in this
            # very advance, in which case its snapshots already hold
            # them and a second transact would double the weights.
            if not sub.seeded_post_transact:
                sub.delta_join.transact(datoms)
            sub.seeded_post_transact = False
            if hasattr(sub.delta_join, "current"):
                # Maintainers tracking their own materialized state
                # replay from it — no second fixpoint via the engine.
                return sub.delta_join.current().withColumn(
                    "__epoch_diff", F.lit(1)
                )
            full = self.engine.interest(sub.name)
            if "diff" not in full.columns:
                full = full.withColumn("diff", F.lit(1))
            return full.withColumn("__epoch_diff", F.lit(1))
        diffs = sub.delta_join.transact(datoms)
        return diffs.withColumn("__epoch_diff", F.lit(1))

    def _advance_recompute(self, sub: Interest) -> DataFrame:
        try:
            current = self.engine.interest(sub.name).persist()
        except KeyError:
            # A rule may reference attributes registered AFTER the
            # subscription (reference: tests/registration_test.rs) —
            # until they exist the result is empty, not an error.
            schema = "__epoch_diff int"
            return self.engine.spark.createDataFrame([], schema=schema)
        current.count()
        if sub.previous is None:
            diffs = current.withColumn("__epoch_diff", F.lit(1))
        else:
            added = current.exceptAll(sub.previous).withColumn(
                "__epoch_diff", F.lit(1)
            )
            removed = sub.previous.exceptAll(current).withColumn(
                "__epoch_diff", F.lit(-1)
            )
            diffs = added.unionByName(removed)
        if sub.previous is not None:
            sub.previous.unpersist()
        sub.previous = current
        return diffs
