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
    AntijoinBinding,
    AttributeBinding,
    Binding,
    Hector,
)


class DeltaJoin:
    """One incrementally-maintained Hector query.

    ``bindings`` may contain attribute, constant, and binary-predicate
    bindings (the ones the reference's delta pipelines support as
    extenders). Antijoin bindings would need retraction-aware negation
    state and are rejected.
    """

    def __init__(
        self,
        spark: SparkSession,
        variables: list[str],
        bindings: list[Binding],
        initial: Optional[dict[str, DataFrame]] = None,
    ):
        if any(isinstance(b, AntijoinBinding) for b in bindings):
            raise ValueError("antijoin bindings are not incrementally maintained")
        self.spark = spark
        self.variables = list(variables)
        self.bindings = list(bindings)
        self.attr_bindings = [
            b for b in bindings if isinstance(b, AttributeBinding)
        ]
        # aid -> consolidated (e, v, diff) snapshot of everything seen.
        self.snapshots: dict[str, DataFrame] = {}
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
        """Compile pipeline i: binding i at its delta, j<i at new,
        j>i at old. Returns None when any required version is absent
        (the join is provably empty)."""

        attrs: dict[str, AttributeSource] = {}
        synth_bindings: list[Binding] = []
        ai = 0
        for b in self.bindings:
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

    def transact(self, datoms: Iterable[Datom]) -> DataFrame:
        """Apply one transaction; return the result diffs of this epoch
        as a DataFrame over ``variables + [diff]``. Cost is driven by
        the deltas, never by re-joining the full snapshots."""

        deltas = self._deltas(datoms)
        news: dict[str, DataFrame] = {}
        for aid in set(self.snapshots) | set(deltas):
            if aid in deltas and aid in self.snapshots:
                news[aid] = self._consolidate(
                    self.snapshots[aid].unionByName(deltas[aid])
                ).localCheckpoint(eager=True)
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
            if pipe is not None:
                pipes.append(pipe.with_diff().df.select(*sel))

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
