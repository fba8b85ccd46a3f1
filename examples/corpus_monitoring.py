"""Corpus monitoring walkthrough: what runs when a source RE-LANDS.

A training-data pipeline doesn't just build a corpus once — sources
re-crawl, benchmarks update, encoders get retrained. This example
composes the round-9 monitoring operators end-to-end over the driver
testdata:

1. snapshot_diff — triage the re-landed source: which doc ids were
   added, removed, changed, unchanged (one full-outer join of
   (id, md5) projections; content never travels wider than a hash);
2. cross_neardup — decontaminate the changed+added docs against the
   benchmark slice (bipartite MinHash-LSH band join, exact-Jaccard
   verify; drop the train side of every pair);
3. token_kl_shift — compare the new snapshot's token distribution to
   the old one (KL both ways + JS over add-one-smoothed unigrams);
4. embed_drift — compare the slices' mean embedding vectors (cosine +
   norm ratio) to catch encoder/domain drift;
5. IncrementalTokenKL — the maintained twin: fold per-epoch document
   batches into O(vocab) count state and read the live divergence
   between epochs without rescanning the corpus.

Run: python examples/corpus_monitoring.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from declarative_dataflow_spark.operators import curation, dedup, profile
from declarative_dataflow_spark.session import build_session
from declarative_dataflow_spark.streaming.corpus_stats import (
    IncrementalTokenKL,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("corpus-monitoring", master="local[8]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # -- 1. the "re-landed" snapshot: some docs gone, some revised ---
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    diff = curation.snapshot_diff(old, new)
    print("snapshot triage:")
    diff.groupBy("status").count().orderBy("status").show()

    # -- 2. decontaminate the touched docs against the benchmark -----
    touched = new.join(
        diff.filter(F.col("status").isin("added", "changed")), "doc_id"
    ).select("doc_id", "text")
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    pairs = dedup.cross_neardup(touched, benchmark, threshold=0.2)
    contaminated = pairs.select("train_id").distinct()
    print(f"near-dup contaminated docs dropped: {contaminated.count()}")
    clean = touched.join(
        contaminated.withColumnRenamed("train_id", "doc_id"),
        "doc_id",
        "left_anti",
    )

    # -- 3/4. distribution drift old -> new ---------------------------
    print("token distribution drift (old vs new snapshot):")
    profile.token_kl_shift(old, new).show()
    print("embedding drift (even vs odd vec ids — stand-in slices):")
    profile.embed_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    ).show()

    # -- 5. the maintained twin over epochs ---------------------------
    state = tempfile.mkdtemp(prefix="kl_state_")
    inc = IncrementalTokenKL(spark, state)
    inc.add(old, "a", epoch=0)
    for ep, frac in enumerate((0, 1, 2)):
        batch = clean.filter(F.col("doc_id") % 3 == frac)
        inc.add(batch, "b", epoch=ep + 1)
        js = inc.current().collect()[0]["js"]
        print(f"epoch {ep + 1}: live JS divergence vs old snapshot = {js}")

    # -- 6. metric changepoints over the ingest timeline --------------
    # The same monitor, pointed at pipeline metrics instead of text:
    # a two-sided mean-shift profile over daily per-type event values
    # surfaces WHEN a source's behavior changed (the seeded +5 shift
    # here stands in for a crawler config change). The maintained
    # twin folds per-epoch batches into (key, day) decimal bin sums
    # and re-derives only touched keys.
    from declarative_dataflow_spark.operators import timeseries
    from declarative_dataflow_spark.streaming.event_stats import (
        IncrementalChangepoint,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    seeded = events.withColumn(
        "value",
        F.col("value")
        + F.when(
            timeseries._epoch_us("ts") >= F.lit(1705363200000000), F.lit(5.0)
        ).otherwise(F.lit(0.0)),
    )
    print("top metric mean-shifts (two-sided 7-day windows):")
    timeseries.changepoint(seeded, window=7).orderBy(
        F.desc("mean_shift")
    ).show(5)

    cp_state = tempfile.mkdtemp(prefix="cp_state_")
    cp = IncrementalChangepoint(spark, cp_state, window=7)
    for ep in range(3):
        cp.process_batch(
            adds=seeded.filter(F.col("event_id") % 3 == ep), epoch=ep
        )
    live = cp.current()
    print(f"maintained profile rows after 3 epochs: {live.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
