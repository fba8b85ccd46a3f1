"""Streaming CompareAndSwap: the input-semantics operator the
reference declares but never implements (its CAS operator and test are
commented out, tests/input_semantics.rs:299-333), completed as a Spark
stateful transformation.

Each op is (e, expected_old, proposed_new, t): the write applies iff
the entity's current value equals expected_old (NULL expected_old =
expect absent; NULL proposed_new = delete). State is one value per
entity in the Structured Streaming state store; each micro-batch folds
its ops in (t, arrival) order — matching the batch engine's
(t, __seq) total order when t values are distinct. Unlike LWW, CAS is
order-dependent by nature: an op arriving after the state has advanced
is applied against the CURRENT value, never retroactively (the
reference's commented design reads the same way — a plain fold over
the input collection).

Scale: state is O(entities), partitioned by the grouping hash; RocksDB
state store for large keyspaces (build_session(rocksdb_state=True)).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("e", LongType()),
        StructField("v", LongType()),
        StructField("present", BooleanType()),
        StructField("t", LongType()),
    ]
)

# (has_value, value, last_t) — has_value distinguishes "absent" from a
# stored value; state-store schemas have no standalone NULL marker.
STATE_SCHEMA = StructType(
    [
        StructField("has", BooleanType()),
        StructField("v", LongType()),
        StructField("t", LongType()),
    ]
)


def _cas_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (e,) = key
    has, cur, last_t = state.get if state.exists else (False, None, None)
    ops: list[tuple] = []
    # Arrival order = a running sequence across ALL chunks the iterator
    # yields; a per-chunk enumerate would reset at chunk boundaries and
    # fold equal-t ops out of arrival order.
    seq = 0
    for pdf in pdfs:
        for t, old, new in zip(pdf["t"], pdf["old"], pdf["new"]):
            ops.append(
                (
                    int(t),
                    seq,
                    None if pd.isna(old) else int(old),
                    None if pd.isna(new) else int(new),
                )
            )
            seq += 1
    for t, _, old, new in sorted(ops, key=lambda o: (o[0], o[1])):
        expect = cur if has else None
        if expect == old:
            if new is None:
                has, cur = False, None
            else:
                has, cur = True, int(new)
        last_t = t if last_t is None else max(last_t, t)
    state.update((has, cur if has else 0, last_t))
    yield pd.DataFrame(
        {
            "e": [e],
            "v": [cur if has else None],
            "present": [has],
            "t": [last_t],
        }
    )


def stream_compare_and_swap(ops: DataFrame) -> DataFrame:
    """Apply CAS semantics to a streaming DataFrame of
    (e, old, new, t). Emits (e, v, present, t) per entity whenever its
    register may have changed (update semantics); ``present=false``
    rows signal deletion."""

    return ops.groupBy("e").applyInPandasWithState(
        _cas_fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
