"""AssocIn sink: fold pull paths into nested JSON documents.

Parity with the reference's AssocIn sink (src/sinks/assoc_in.rs:22-32,
merge_paths 140-231), which assembles `[eid, aid, eid, aid, v, ...]`
path tuples into nested maps (Clojure assoc-in semantics).

Spark-first: the fold runs bottom-up — the deepest nesting level is
grouped into per-entity maps, re-emitted as (link-attribute, json)
rows at its parent level, and the loop repeats until only the root
remains. Every step is collect_list + map_from_entries + to_json —
all JVM-side; documents are built where the data lives, never on the
driver. Arbitrary nesting depth.
"""

from __future__ import annotations

from typing import Optional, Sequence

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


def assoc_in(
    pull_rows: DataFrame,
    path_cols: list[str],
    links: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fold flat pull rows into one JSON document per root entity.

    ``pull_rows`` has columns ``path_cols`` (root eid, then intermediate
    entity ids; segments beyond a row's depth are NULL), then ``a``
    (attribute) and ``v`` (string value). ``links[k]`` names the
    attribute that nests depth k+2 under depth k+1 (the reference's
    path_attributes); defaults to "children". Child documents are keyed
    by child entity id — cardinality-many links stay lossless. Returns
    (root, doc) where doc is nested JSON.
    """

    depth = len(path_cols)
    link_names = list(links) if links else ["children"] * (depth - 1)
    if len(link_names) != depth - 1:
        raise ValueError("need one link attribute per nesting step")

    df = pull_rows
    for d in range(depth, 1, -1):
        leaf = path_cols[d - 1]
        parents = path_cols[: d - 1]
        level = df.filter(F.col(leaf).isNotNull())
        rest = df.filter(F.col(leaf).isNull()).drop(leaf)
        # One map per entity at this depth, then one map of child docs
        # per parent, re-entering the fold as a single (a, v) row.
        child_docs = _entries_map(level, parents + [leaf])
        entries = (
            child_docs.groupBy(*parents)
            .agg(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(leaf).cast("string").alias("k"),
                                F.to_json("m").alias("j"),
                            )
                        )
                    )
                ).alias("cm")
            )
            .select(
                *parents,
                F.lit(link_names[d - 2]).alias("a"),
                F.to_json("cm").alias("v"),
            )
        )
        df = rest.unionByName(entries)

    root = path_cols[0]
    return _entries_map(df, [root]).select(
        F.col(root).alias("root"), F.to_json("m").alias("doc")
    )
