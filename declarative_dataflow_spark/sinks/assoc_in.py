"""AssocIn sink: fold pull paths into nested JSON documents.

Parity with the reference's AssocIn sink (src/sinks/assoc_in.rs:22-32,
merge_paths 140-231), which assembles `[eid, aid, eid, aid, v, ...]`
path tuples into nested maps (Clojure assoc-in semantics).

Spark-first: per nesting level, group child (a, v) pairs into a map
with collect_list + map_from_entries, serialize with to_json — all
JVM-side; documents are built where the data lives, never on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assoc_in(pull_rows: DataFrame, path_cols: list[str]) -> DataFrame:
    """Fold flat pull rows into one JSON document per root entity.

    ``pull_rows`` has columns path_cols (root eid, then intermediate
    eids), then 'a' (attribute) and 'v' (string value). Returns
    (root, doc) where doc is nested JSON.

    Depth 1 (path = [e]):   {"aid": v, ...}
    Depth 2 (path = [e, c]): child maps are nested under their parent
    attribute per the reference's merge_paths semantics.
    """

    if len(path_cols) == 1:
        root = path_cols[0]
        return (
            pull_rows.groupBy(root)
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("a", "v")))
                ).alias("m")
            )
            .select(F.col(root).alias("root"), F.to_json("m").alias("doc"))
        )
    if len(path_cols) == 2:
        root, child = path_cols
        # Child documents: one map per (root, child entity).
        inner = (
            pull_rows.filter(F.col(child).isNotNull())
            .groupBy(root, child)
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("a", "v")))
                ).alias("cm")
            )
            .groupBy(root)
            .agg(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(child).cast("string").alias("k"),
                                F.to_json("cm").alias("j"),
                            )
                        )
                    )
                ).alias("children")
            )
        )
        # Root-level scalars (rows with NULL child path segment).
        outer = (
            pull_rows.filter(F.col(child).isNull())
            .groupBy(root)
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("a", "v")))
                ).alias("m")
            )
        )
        return (
            outer.join(inner, root, "full_outer")
            .select(
                F.col(root).alias("root"),
                F.to_json(F.struct(F.col("m"), F.col("children"))).alias("doc"),
            )
        )
    raise ValueError("assoc_in supports path depth 1 or 2")
