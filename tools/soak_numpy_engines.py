"""30x-data soak for the Arrow-batched numpy engine family.

The round-8 rewrites (semdedup / minhash_lsh / simhash_neardup /
pq_topk and the probe/assign kernels behind cosine_topk / ann_ivf /
kmeans / retrieval_eval) were all qualified at sf1 (10x sf0.1). This
soak builds an sf3 replica (30x sf0.1 — cell/bucket/band counts
roughly triple vs sf1 because every density lever derives from the
corpus count) and times the family at sf1 AND sf3 in one session.

Linearity gate (the round-2 soak's discipline): 3x data should cost
about 3x wall; FAIL if any query is worse than 2x linear (ratio > 6).

Usage: python tools/soak_numpy_engines.py  →  one JSON line + a
markdown table for SCALE.md on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

FAMILY = [
    "semdedup",
    "minhash_lsh",
    "simhash_neardup",
    "pq_topk",
    "cosine_topk",
    "ann_ivf",
    "ann_ivf_kmeans",
    "kmeans",
    "retrieval_eval",
    "embed_neardup",
]

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_scale/sf1")
SF3_DIR = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_scale/sf3")
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from declarative_dataflow_spark.session import build_session
    from scale_testdata import scale

    import __spark_entry__ as entry_mod

    spark = build_session("soak-numpy")
    for d, factor in ((SF1_DIR, 10), (SF3_DIR, 30)):
        # embeddings.parquet is the LAST table scale() writes — its
        # presence proves a complete replica (bench.py's gate).
        if not os.path.exists(f"{d}/embeddings.parquet"):
            scale(spark, SRC, d, factor)

    qs = entry_mod.queries()
    # Warm codegen/catalog outside the timed windows.
    qs["cosine_topk"](spark, SRC).count()
    qs["minhash_lsh"](spark, SRC).count()

    def run(block: str) -> dict[str, float]:
        out = {}
        for name in FAMILY:
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, block).count()
            out[name] = round(time.perf_counter() - t0, 2)
        return out

    t1 = run(SF1_DIR)
    t3 = run(SF3_DIR)
    rows = []
    worst = (None, 0.0)
    for name in FAMILY:
        ratio = round(t3[name] / t1[name], 2) if t1[name] else float("inf")
        rows.append((name, t1[name], t3[name], ratio))
        if ratio > worst[1]:
            worst = (name, ratio)
    print("| query | sf1 s | sf3 s | ratio (3x data) |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(
        json.dumps(
            {
                "metric": "numpy_engine_soak_sf1_to_sf3",
                "sf1": t1,
                "sf3": t3,
                "worst": {"query": worst[0], "ratio": worst[1]},
                "gate": "ratio <= 6 (2x linear at 3x data)",
                "pass": worst[1] <= 6,
                "load1": load1,
            }
        )
    )


if __name__ == "__main__":
    main()
