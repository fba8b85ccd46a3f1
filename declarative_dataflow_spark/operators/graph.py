"""Graph analytics over edge DataFrames: recursive aggregation.

Beyond-reference extension: recursion whose per-iteration combine is
an AGGREGATE (min) rather than set union — the lattice-monotone class
(shortest paths, reachability-with-cost) that set-semantics semi-naive
cannot express but converges under delta-driven relaxation.

Spark-first shape (delta Bellmann-Ford):

    dist_0  = edges (hop 1)
    cand_i  = delta_i ⋈ edges      (relax only rows that IMPROVED)
    dist_i+1 = min-combine(dist_i ∪ cand_i)
    delta_i+1 = dist_i+1 \\ dist_i  (strictly improved rows)

Each round is one join + one min-combine shuffle (map-side partial
aggregation), work proportional to the improved rows, and
``localCheckpoint`` truncates lineage per round — the same recursion
discipline as the engine fixpoint (engine.py::_run_semi_naive).
Convergence in <= graph-diameter rounds.

The connected-components operator lives in dedup.py
(hash-min label propagation); this module holds the weighted variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shortest_hops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 100,
) -> DataFrame:
    """Minimum hop count between every reachable (x, y) pair:
    (x, y, hops). Delta-driven relaxation; terminates on any graph
    (cycles included) because hop counts only improve.

    At 100 TB scale the per-round state is the pair-distance table
    partitioned by the join key; AQE handles skewed hub nodes, and
    rounds are bounded by the diameter, not the data size.
    """

    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t")
    ).distinct()
    dist = (
        e.select(
            F.col("s").alias("x"),
            F.col("t").alias("y"),
            F.lit(1).alias("hops"),
        )
        .localCheckpoint(eager=True)
    )
    delta = dist
    for _ in range(max_iters):
        cand = (
            delta.join(e, delta["y"] == e["s"])
            .select("x", F.col("t").alias("y"), (F.col("hops") + 1).alias("hops"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("x", "y")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
        delta = merged.join(dist, ["x", "y", "hops"], "left_anti").localCheckpoint(
            eager=True
        )
        dist = merged
        if delta.limit(1).isEmpty():
            return dist
    raise RuntimeError(f"shortest_hops did not converge in {max_iters} rounds")
