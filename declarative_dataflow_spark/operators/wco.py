"""Worst-case-optimal join patterns, Spark-native.

The reference's Hector runs cyclic conjunctions as a worst-case-
optimal delta join: each variable extends by proposing candidates from
the relation with the fewest, validated against the others
(src/plan/hector.rs:934-978). Catalyst's binary join chains are
asymptotically worse on cyclic patterns — the triangle query's
intermediate edge-edge join can be |E|·d rows before the closing
filter.

The Spark-native WCO realization avoids per-key adaptive control flow
(which Spark cannot express cheaply) but keeps the worst-case-optimal
intersection: build adjacency lists once, then for each bound prefix
intersect candidate sets ROW-LOCALLY with array_intersect. For the
triangle, that is one shuffle (adjacency grouping) + one broadcast-able
join per prefix extension, and the intermediate is |E| rows — never
the |E|·d wedge blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def adjacency(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, sorted distinct neighbor array) — the arrangement the
    extensions intersect against."""

    return edges.groupBy(F.col(src).alias("node")).agg(
        F.sort_array(F.collect_set(F.col(dst))).alias("nbrs")
    )


def triangles_wco(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """All triangles [?a edge ?b][?b edge ?c][?a edge ?c] via
    prefix-extension intersection: for each edge (a, b), c ranges over
    N(a) ∩ N(b) computed row-locally. Returns (a, b, c).

    Worst-case size of the intermediate state is |E| rows carrying two
    bounded adjacency arrays — the binary-join plan materializes the
    full wedge set (|E|·avg-degree rows) first. Skewed high-degree
    nodes cost one long array per row, not a blown-up join partition.
    """

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    adj = adjacency(edges, src, dst)
    return (
        e.join(adj.select(F.col("node").alias("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.explode(F.array_intersect("na", "nb")).alias("c"),
        )
    )


def triangle_count_wco(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triangle count without materializing the triangles: sum of
    intersection sizes per edge (one row per edge, no explode)."""

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    adj = adjacency(edges, src, dst)
    per_edge = (
        e.join(adj.select(F.col("node").alias("a"), F.col("nbrs").alias("na")), "a")
        .join(adj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select(F.size(F.array_intersect("na", "nb")).alias("k"))
    )
    return per_edge.agg(F.sum("k").cast("long").alias("n"))
