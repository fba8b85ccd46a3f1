"""Training-data curation walkthrough: the 100 TB pipeline in miniature.

Composes the beyond-reference operators end-to-end over the driver
testdata: quality filtering -> language ID -> blocklist + char-entropy
gates -> PII scrubbing -> exact + near-duplicate removal (with
connected-component group resolution) -> repetition filtering ->
Bloom-prefiltered benchmark decontamination (the m-bit broadcast scans
everything; the exact n-gram join only touches flagged docs) +
boilerplate (duplicate-ngram) filtering -> NB-classifier + perplexity
tail drop -> DSIR importance reweighting with a weighted deterministic
resample -> per-language token-budget mixing -> deterministic
train/val/test split -> sequence packing -> sharded reproducible
shuffle + Z-order clustered write layout -> int8-quantized embeddings
for ANN.
Every stage is JVM-side DataFrame expressions; the only shuffles are
the dedup band join, the component resolution, the n-gram
aggregations, the partitioned pack/shuffle windows, and the final
write.

Run: python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from declarative_dataflow_spark.operators import (
    curation,
    dedup,
    packing,
    sampling,
    similarity,
    text,
)
from declarative_dataflow_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("curation", master="local[8]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Signal columns: quality, language, repetition — one fused scan.
    quality = text.quality_score(docs)
    langs = text.lang_id(docs)
    reps = text.repetition_stats(docs)
    scored = (
        docs.join(quality.select("doc_id", "quality"), "doc_id")
        .join(langs, "doc_id")
        .join(reps.select("doc_id", "rep_ratio"), "doc_id")
    )

    # 2. Filter: keep scored, non-repetitive, language-identified docs
    #    that pass the blocklist (word-delimited, broadcast phrase set)
    #    and sit in a sane char-entropy band (drops padding/noise).
    ent = text.char_entropy(docs)
    blocked = text.blocklist_filter(docs, ["xxx", "click here", "lorem ipsum"])
    kept = (
        scored.filter(
            (F.col("quality") > 0.2)
            & (F.col("rep_ratio") < 0.9)
            & (F.col("lang_pred") != "und")
        )
        .join(
            blocked.filter(F.col("blocked")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        .join(
            ent.filter(
                (F.col("entropy") < 1.0) | (F.col("entropy") > 6.0)
            ).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    )

    # 3. PII scrub the surviving text.
    clean = text.pii_redact(kept).select(
        "doc_id", F.col("redacted").alias("text")
    )
    clean = kept.drop("text").join(clean, "doc_id")

    # 4. Dedup: exact groups first, then MinHash-LSH near-dups resolved
    #    to canonical docs via connected components.
    exact = dedup.exact_dedup_groups(clean)
    canon = clean.join(
        exact.select(F.col("canonical").alias("doc_id")), "doc_id", "left_semi"
    )
    groups = dedup.dedup_groups(canon)
    unique = canon.join(
        groups.filter(F.col("doc_id") == F.col("canonical")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 5. Decontaminate against the "benchmark" (stand-in: every 50th
    #    doc) and drop boilerplate-heavy docs (duplicate-3-gram frac).
    #    The Bloom filter goes FIRST: m bits broadcast against the
    #    whole corpus, and the exact n-gram join only runs on the docs
    #    the filter flagged (one-sided error means nothing is missed) —
    #    at 100 TB the expensive exact check touches a sliver.
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    pre = curation.bloom_contamination(unique, ev)
    suspects = unique.join(
        pre.filter(F.col("n_flagged") > 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    cont = curation.contamination(suspects, ev)
    boiler = curation.dup_ngram_frac(unique)
    unique = (
        unique.join(
            cont.filter(F.col("contamination") >= 0.8).select("doc_id"),
            "doc_id",
            "left_anti",
        ).join(
            boiler.filter(F.col("dup_frac") >= 0.95).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    )

    # Materialize once: everything below fans out from `unique`, and
    # without a persist each consumer would recompute the full
    # quality -> dedup -> anti-join lineage (at cluster scale: re-read
    # the corpus per stage).  localCheckpoint also truncates the plan.
    unique = unique.localCheckpoint(eager=True)
    n_after_dedup = unique.count()

    # 5b. Model-based quality: NB log-odds on the corpus's own Gopher
    #     gate; drop the CCNet-style perplexity tail as well.
    nb = text.nb_quality_score(unique, min_words=10)
    tiers = text.lm_quality_buckets(unique, buckets=3)
    unique = (
        unique.join(
            nb.filter(F.col("score") < -50).select("doc_id"),
            "doc_id",
            "left_anti",
        ).join(
            tiers.filter(F.col("bucket") == 3).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    )
    unique = unique.localCheckpoint(eager=True)

    # 5c. Corpus report from constant-state sketches + the
    #     exact-substring duplication signal.
    from declarative_dataflow_spark.operators import retrieval, sketch

    hll = sketch.hll_distinct(unique).first()
    heavy = sketch.cms_topk(unique, k=3).collect()
    spans = curation.dup_spans(unique, n=5).count()

    # 5d. DSIR: reweight the survivors toward the 'en' slice (stand-in
    #     for a high-quality target domain) and draw a length-weighted
    #     deterministic sample — the importance-resampling step that
    #     tilts a raw web mix toward the target distribution.
    dsir = curation.dsir_weights(unique, unique.filter(F.col("lang") == "en"))
    resample = sampling.weighted_sample(
        unique.join(dsir.select("doc_id", "dsir_logw"), "doc_id").withColumn(
            "w", F.exp(F.col("dsir_logw") / 10).cast("double") * F.col("n_chars")
        ),
        k=400,
        weight_col="w",
    )

    # 6. Assemble the mix under per-language token budgets, then split
    #    deterministically and pack the train split into sequences.
    mix = curation.token_budget_mix(
        unique, {"en": 50_000, "es": 20_000, "de": 20_000, "fr": 20_000,
                 "zh": 20_000}
    )
    mixed = unique.join(mix.select("doc_id"), "doc_id", "left_semi")
    split = sampling.hash_split(
        mixed, {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    packed = packing.seq_pack(split.filter(F.col("split") == "train"))

    # 7. Reproducible training order: hash-dealt shards, in-shard
    #    positions (a writer would partitionBy(shard) sortBy(pos)).
    #    The physical write clusters on a Z-order key over
    #    (lang-bucket, length-bucket) so a reader filtering on either
    #    dimension prunes files by parquet min/max stats.
    from declarative_dataflow_spark import layout

    order = curation.global_shuffle(split.filter(F.col("split") == "train"))
    zlaid = layout.zorder_layout(
        split.withColumn(
            "lang_b", F.abs(F.hash("lang")) % 64
        ).withColumn("len_b", F.least(F.col("n_chars") / 16, F.lit(63)).cast("long")),
        ["lang_b", "len_b"],
        bits=6,
        partitions=8,
    )

    # 8. Embedding side: int8 quantization for the ANN index, k-means
    #    topic cells labeled by TF-IDF keywords, and a hybrid
    #    (BM25 + dense) retrieval probe.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    quant = similarity.quantize_embeddings(emb)
    cells = similarity.kmeans_assign(emb, k=4, iters=2)
    labels = retrieval.tfidf_topk_terms(docs, k=1)
    probe = retrieval.rrf_fusion(
        docs, emb, ["spark", "query"], query_vec_id=0, k=3, depth=20
    )

    print(f"docs in: {n0}")
    print(f"after quality/lang/repetition: {kept.count()}")
    print(f"after exact dedup: {canon.count()}")
    print(f"after near-dup + decontamination + boilerplate: {n_after_dedup}")
    print(f"after NB-classifier + perplexity-tail drop: {unique.count()}")
    print(
        "distinct tokens ~ "
        f"{hll['est']:.0f} (exact {hll['exact']}); "
        "heavy hitters: "
        + ", ".join(f"{r['term']}({r['est']})" for r in heavy)
    )
    print(f"cross-doc duplicated spans: {spans}")
    print(f"kmeans cells: {cells.select('cell').distinct().count()}")
    print(f"hybrid probe top doc: {probe.first()['doc_id']}")
    print(f"cluster label sample: {labels.first()['term']}")
    print(f"DSIR-resampled docs: {resample.count()}")
    print(f"z-order layout partitions: {zlaid.rdd.getNumPartitions()}")
    print(f"after token-budget mix: {mixed.count()}")
    print(f"train packs: {packed.agg(F.max('pack_id')).first()[0]}")
    print(f"train shards: {order.agg(F.countDistinct('shard')).first()[0]}")
    print(f"quantized vectors: {quant.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
