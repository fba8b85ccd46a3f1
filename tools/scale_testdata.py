"""Scale the driver's sf0.1 testdata up by integer replication for
soak runs (the driver's generator is not available; /root/testdata is
read-only).

Each copy offsets every entity key by ``copy * stride`` so referential
integrity holds (orders still point at their copy's customers,
lineitems at their copy's orders/parts/suppliers) while row counts and
join fan-outs scale linearly. Dimension tables region/nation stay
fixed, like TPC-H. Document text and embedding ids get a per-copy salt
so exact-dedup/minhash keep realistic (not 10x-degenerate) duplicate
rates: the salt rewrites a rare token, leaving shingle distributions
intact.

Usage: python tools/scale_testdata.py [factor] [out_dir]
  factor  integer >= 1 (default 10 -> sf1 from sf0.1)
  out_dir default /tmp/spark_graft_scale/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

# key column -> offset stride (beyond any sf's key range)
STRIDE = 100_000_000

# events feed the GRAPH queries, which derive node ids by modding
# user_id/event_id (domains 10/50/100/1000/10000) and sparsify by
# event_id % {5,7,11}. The generic stride is ≡ 1 (mod 11), so each
# copy used to pass a DIFFERENT 1/11 slice of the `event_id % 11 = 0`
# filter, contributing new residue combinations over the same ≤1000
# nodes — the replicated graph DENSIFIED (combinatorially more
# cliques; sf1 wco_clique4 measured ~19x for 10x data, an instance
# artifact, not scaling). The query text's mods cap the node domain,
# so a replica cannot GROW the graph either; the honest semantic is
# to PRESERVE it: a stride ≡ 0 mod lcm(5,7,10,11,50,100,1000,10000)
# = 770000 makes every copy contribute the identical derived edge
# set, so after DISTINCT the sf1 graph equals the sf0.1 graph and the
# graph rows measure 10x ingest + dedup against constant topology.
# 100_100_000 = 770000 * 130 also exceeds every key range.
EVENTS_STRIDE = 100_100_000

KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXED = ["region", "nation"]


def _replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    copies = (
        df.crossJoin(
            F.broadcast(
                df.sparkSession.range(factor).select(
                    F.col("id").alias("__copy")
                )
            )
        )
    )
    out = copies
    stride = EVENTS_STRIDE if table == "events" else STRIDE
    for k in KEYS[table]:
        out = out.withColumn(k, F.col(k) + F.col("__copy") * stride)
    if table == "documents":
        # Rotate TWO disjoint high-frequency character alphabets per
        # copy: most words (hence most shingles) differ between copies,
        # so the corpus keeps sf0.1's near-dup RATE instead of giving
        # every document factor-1 near-twins (which would inflate LSH
        # candidate counts quadratically and measure an artifact, not
        # scaling). A single 11-letter rotation was identity at
        # copy % 11 == 0, so any factor > 11 gave copies 11/22/...
        # text IDENTICAL to copy 0 — the r9 sf3 soak measured
        # simhash_neardup at 8.6x for 3x data purely from those exact
        # twins. The second alphabet rotates by copy div 11, making
        # the combined translation injective up to 121 copies (identity
        # only at copy 0, which IS the original). Copies < 11 see
        # rotation 0 on the second alphabet — sf1 replicas are
        # byte-identical to the old scaler's, so trend numbers hold.
        a1, a2 = "etaoinshrdl", "cumwfgypbvk"
        r1 = ", ".join(repr(a1[c:] + a1[:c]) for c in range(len(a1)))
        r2 = ", ".join(repr(a2[c:] + a2[:c]) for c in range(len(a2)))
        out = out.withColumn(
            "text",
            F.when(
                F.col("__copy") > 0,
                F.expr(
                    f"translate(text, '{a1}{a2}', "
                    f"element_at(array({r1}), CAST(__copy % 11 AS INT) + 1)"
                    f" || element_at(array({r2}), "
                    "CAST((__copy div 11) % 11 AS INT) + 1))"
                ),
            ).otherwise(F.col("text")),
        )
    return out.drop("__copy")


def scale(spark, src: str, out_dir: str, factor: int) -> None:
    """Write the replicated tables; reusable from bench.py."""

    os.makedirs(out_dir, exist_ok=True)
    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
    for t in KEYS:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        _replicate(df, t, factor).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_scale/sf1"
    )
    src = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")

    from declarative_dataflow_spark.session import build_session

    spark = build_session("scale_testdata")
    scale(spark, src, out_dir, factor)
    print("done")


if __name__ == "__main__":
    main()
