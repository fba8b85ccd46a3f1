"""AssocIn sink: fold pull paths into nested JSON documents.

Parity with the reference's AssocIn sink (src/sinks/assoc_in.rs:22-32,
merge_paths 140-231), which assembles path tuples into nested maps with
Clojure assoc-in semantics: every tuple is ``[key.., leaf-key,
leaf-value]`` and the document gets ``doc[key0][key1]..[leaf-key] =
leaf-value``. Keys are entity ids or attribute names interchangeably
(merge_paths parse_key, assoc_in.rs:160-166) — cardinality-single pull
levels interleave link attributes into the path, cardinality-many
levels keep child entity ids as keys, and the sink treats both
uniformly.

Spark-first: the fold runs bottom-up — the deepest nesting level is
grouped into per-prefix maps, re-emitted as (key, json) rows one level
up, and the loop repeats until only the root remains. Every step is
collect_list + map_from_entries + to_json — all JVM-side; documents are
built where the data lives, never on the driver. Arbitrary nesting
depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _entries_map(df: DataFrame, keys: list[str]):
    """Group (a, v) rows under ``keys`` into a sorted map column ``m``.

    Cardinality-many attributes (several v for one a — the reference's
    multi-valued :aka, tests/query_test.rs:369-377) nest as a JSON
    array; single values stay plain. Without this pre-aggregation,
    map_from_entries would reject the duplicate keys outright.
    """

    per_attr = df.groupBy(*keys, "a").agg(
        F.sort_array(F.collect_list("v")).alias("__vs")
    )
    value = F.when(F.size("__vs") == 1, F.col("__vs")[0]).otherwise(
        F.to_json("__vs")
    )
    return (
        per_attr.withColumn("v", value)
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("a", "v")))
            ).alias("m")
        )
    )


def assoc_in(pull_rows: DataFrame, path_cols: list[str]) -> DataFrame:
    """Fold flat pull rows into one JSON document per root entity.

    ``pull_rows`` has columns ``path_cols`` (root eid, then nested map
    keys — link attributes for cardinality-single levels, child entity
    ids for cardinality-many ones; segments beyond a row's depth are
    NULL), then ``a`` (leaf key) and ``v`` (string value). Returns
    (root, doc) where doc is nested JSON:
    ``doc[path1]..[pathN][a] = v``.
    """

    depth = len(path_cols)
    df = pull_rows
    for d in range(depth, 1, -1):
        leaf = path_cols[d - 1]
        parents = path_cols[: d - 1]
        level = df.filter(F.col(leaf).isNotNull())
        rest = df.filter(F.col(leaf).isNull()).drop(leaf)
        # One map per path prefix at this depth, re-entering the fold as
        # a single (key, json-doc) row of the parent level.
        entries = (
            _entries_map(level, parents + [leaf])
            .select(
                *parents,
                F.col(leaf).cast("string").alias("a"),
                F.to_json("m").alias("v"),
            )
        )
        df = rest.unionByName(entries)

    root = path_cols[0]
    return _entries_map(df, [root]).select(
        F.col(root).alias("root"), F.to_json("m").alias("doc")
    )
