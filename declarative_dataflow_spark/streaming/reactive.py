"""ReactiveSession: the reference's end-to-end contract — clients
transact datoms and receive incrementally-maintained result diffs for
every registered interest (README.md:12-23; server loop
server/src/main.rs:588-656).

Spark-first realization: each transaction advances the epoch
(micro-batch analog); every interested rule is re-evaluated through
the engine's Catalyst-compiled plan and diffed against the previous
epoch's snapshot with a distributed exceptAll — no driver-side
relation state. True operator-level incrementalization (differential
arrangements) is intentionally NOT mimicked; for the streaming-source
path the same diffing runs inside foreachBatch (see diff_sink).

Scale notes: snapshots are cached DataFrames (swap for Delta tables at
very large results); re-evaluation cost is one Catalyst job per epoch,
which AQE sizes to the actual data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from ..engine import Datom, Engine


@dataclass
class Interest:
    """A subscription to a rule's result diffs
    (reference: Interest request, src/server/mod.rs:109-119)."""

    name: str
    callback: Optional[Callable[[DataFrame, int], None]] = None
    previous: Optional[DataFrame] = None
    history: list[tuple[int, list]] = field(default_factory=list)


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
    ) -> None:
        if name not in self.engine.rules:
            raise KeyError(f"unknown rule {name}")
        self.interests[name] = Interest(name, callback)

    def uninterest(self, name: str) -> None:
        """Tear down a subscription (reference: Uninterest +
        ShutdownHandle, src/server/mod.rs:475-488)."""

        sub = self.interests.pop(name, None)
        if sub is not None and sub.previous is not None:
            sub.previous.unpersist()

    def transact(self, datoms: Iterable[Datom]) -> int:
        """Append a transaction and advance the domain: re-evaluate all
        interests and emit diffs vs the previous epoch."""

        self.engine.transact(datoms)
        return self.advance()

    def advance(self) -> int:
        epoch = self.epoch
        for sub in self.interests.values():
            current = self.engine.interest(sub.name).persist()
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
            if sub.callback is not None:
                sub.callback(diffs, epoch)
            else:
                sub.history.append((epoch, diffs.collect()))
            if sub.previous is not None:
                sub.previous.unpersist()
            sub.previous = current
        self.epoch += 1
        return epoch
