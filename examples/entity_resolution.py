"""Entity-resolution walkthrough: the round-9 record-linkage stack.

Near-identical KEYS (author names, product codes, titles) are a
different dedup problem from near-identical DOCUMENTS: the strings
are short, the corruption model is typos (edit distance), and recall
must be provable — a missed link silently splits an entity. This
example composes the operators end-to-end over the driver testdata:

1. fuzzy_match_pairs — every pair of customer names within
   Levenshtein distance 1, via COMPLETE symmetric-deletion blocking
   (FastSS: two strings within distance 1 share an equal member of
   their {0,1}-deletion neighborhoods), so recall is structural, not
   probabilistic. Variants shuffle as constant-width xxhash64 keys;
   the exact levenshtein verify runs per candidate.
2. fuzzy_match_groups — transitive closure over the pair graph
   (a~b, b~c => one entity) with canonical = min id, the
   dedup_groups discipline.
3. The survivor projection — keep id = canonical, the one
   deterministic representative per entity.
4. Contrast with sorted_neighborhood_pairs — the classic
   window-after-sort blocker finds pairs whose errors cluster under
   sorting but has no completeness guarantee; fuzzy_match is the
   recall-safe path for a bounded edit radius.

Run: python examples/entity_resolution.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from declarative_dataflow_spark.operators import dedup
from declarative_dataflow_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("entity-resolution", master="local[8]")
    # The % 7 slice keeps the distance-1 graph sparse enough to show
    # real cluster structure (see q_fuzzy_groups).
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 7 == 0
    )

    # -- 1. the linkage pairs ----------------------------------------
    pairs = dedup.fuzzy_match_pairs(
        customers, id_col="c_custkey", s_col="c_name", max_dist=1
    ).localCheckpoint(eager=False)
    print("distance histogram of linked pairs:")
    pairs.groupBy("dist").count().orderBy("dist").show()

    # -- 2. entities via transitive closure ---------------------------
    groups = dedup.fuzzy_match_groups(
        customers, id_col="c_custkey", s_col="c_name", max_dist=1
    ).localCheckpoint(eager=False)
    sizes = groups.groupBy("canonical").count()
    print("entity-size histogram:")
    sizes.groupBy("count").count().orderBy("count").show()

    # -- 3. one survivor per entity -----------------------------------
    survivors = groups.filter(F.col("id") == F.col("canonical"))
    n_rows = customers.count()
    n_entities = survivors.count()
    print(f"{n_rows} rows -> {n_entities} entities "
          f"({n_rows - n_entities} near-duplicate keys collapsed)")

    # -- 4. contrast: sorted-neighborhood candidates -------------------
    snm = dedup.sorted_neighborhood_pairs(
        customers.select(
            F.col("c_custkey").alias("doc_id"),
            F.col("c_name").alias("text"),
        ),
        window=3,
    )
    snm_hits = (
        snm.join(
            pairs.select("a", "b"),
            (snm["a"] == pairs["a"]) & (snm["b"] == pairs["b"]),
            "left_semi",
        ).count()
    )
    print(
        f"sorted-neighborhood(window=3) candidates cover {snm_hits} of "
        f"{pairs.count()} true distance-1 pairs — the blocker is cheap "
        "but incomplete; symmetric deletion is the recall-safe path."
    )
    spark.stop()


if __name__ == "__main__":
    main()
