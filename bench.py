"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line: {"metric", "value", "unit", "queries" (slowest
10), "sf", "load1", "sf1"} — the FULL per-query map for both scale
factors is written to BENCH_LOCAL.json next to this file (the printed
line stays small so the driver's tail capture can't truncate it; the
r7 record was lost exactly that way).

Each query is forced with a count() action (full compute, no
driver-side result materialization beyond the count).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "agg_multi",       # flagship grouped multi-aggregate (TPC-H Q1 shape)
    "hector_fused",    # multiway join with scan fusion
    "join_binary",     # binary equijoin
    "antijoin",        # negation
    "agg_median",      # exact median (windowed)
    "tclosure",        # recursive fixpoint
    "tclosure_nonlinear",  # non-linear recursion (generalized semi-naive)
    "labelprop",       # reference labelprop benchmark (recursive)
    "triangle_count",  # reference WCO triangle benchmark (join chain)
    "triangle_wco",    # worst-case-optimal intersection variant
    "confusion_filter",  # reference confusion q1 (fused filter scan)
    "confusion_agg",   # reference confusion q2 (grouped count)
    "lww",             # last-write-wins input semantics
    "cas",             # compare-and-swap register fold (completed stub)
    "union",           # set union
    "pull_level",      # document projection
    "dedup_exact",     # exact hash dedup
    "sorted_neighborhood",  # SNM blocking (global rn via range+offsets)
    "minhash_lsh",     # MinHash LSH near-dup (banded candidates + verify)
    "simhash",         # SimHash fingerprints
    "simhash_neardup",  # Manku-banded Hamming-LSH near-dup pairs
    "cosine_topk",     # brute-force ANN baseline
    "ann_lsh",         # hyperplane-LSH ANN (scale path)
    "text_quality",    # quality scoring
    "lang_id",         # language ID
    "seq_pack",        # sequence packing (sharded window cumsum)
    "pii_redact",      # PII scrub (regex, map-only)
    "dup_ngram_frac",  # corpus-wide duplicate-ngram boilerplate signal
    "cross_neardup",   # bipartite train x eval LSH decontamination (r9)
    "token_kl_shift",  # unigram KL/JS drift between corpus slices (r9)
    "embed_drift",     # embedding mean-vector drift between slices (r9)
    "snapshot_diff",   # re-crawl audit: added/removed/changed/unchanged (r9)
    "global_shuffle",  # deterministic sharded training-order shuffle
    "topk_plan",       # TopK operator (TakeOrderedAndProject lowering)
    "wco_clique4",     # generic WCO lowering, 6-binding 4-clique
    "ann_ivf",         # IVF ANN (broadcast centroids, nprobe cells)
    "ann_recall",      # IVF recall@k vs exact scan (index-quality eval)
    "pq_topk",         # product-quantization ANN (ADC table lookups)
    "shortest_cost",   # weighted recursive aggregate (delta relaxation)
    "kcore",           # shrink-to-fixpoint peel (degree agg + joins)
    "graph_cc",        # hash-min connected components to checked fixpoint
    "window_tumbling",  # streaming window operator on batch input
    "window_sliding",  # overlapping sliding windows
    "window_session",  # merging session windows
    "gopher_rules",    # Gopher A1.1 quality gate (map-only)
    "line_dedup",      # corpus-level boilerplate-line removal
    "bm25_topk",       # BM25 lexical retrieval
    "ngram_lm_score",  # bigram-LM quality scoring
    "bpe_merges",      # BPE tokenizer training (8 argmax rounds)
    "bpe_encode",      # BPE tokenizer application (per-doc token counts)
    "hll_distinct",    # HyperLogLog distinct tokens (256 registers)
    "cms_topk",        # Count-Min heavy hitters (4x512 grid)
    "chunk_docs",      # RAG token-window chunking (map-only)
    "rrf_fusion",      # hybrid BM25 + dense retrieval fusion
    "lm_buckets",      # CCNet perplexity tiers (TakeOrdered cut points)
    "dup_spans",       # exact-substring dedup spans (Lee et al. 2022)
    "nb_quality",      # NB quality classifier on Gopher weak labels
    "kmeans",          # Lloyd k-means assignments (2 iters, k=8)
    "hist_quantiles",  # log-bucket histogram p50/p90/p99 (<= 41-row state)
    "corpus_profile",  # one-pass per-column data card (Expand multi-distinct)
    "dsir_weights",    # DSIR hashed-bigram importance weights
    "bloom_contam",    # Bloom-filter decontamination (4096-bit broadcast)
    "weighted_sample",  # Efraimidis-Spirakis weighted reservoir (top-k keys)
    "interval_join",   # bucketized range join (equi-join + residual filter)
    "rolling_stats",   # per-key trailing-window stats (partitioned RANGE)
    "asof_join",       # point-in-time join (union + window, no range join)
    "zorder_key",      # Morton clustering key (pure bit arithmetic)
    "char_entropy",    # row-local Shannon entropy (map-only fold)
    "blocklist",       # C4 badwords gate (per-length shingle + broadcast)
    "quality_calibrate",  # per-language percentile (partitioned window)
    "semdedup",        # SemDeDup: within-kmeans-cluster cosine pairs
    "hash_embed",      # feature-hashing embeddings (1 agg, dim cond sums)
    "resample_locf",   # hourly-grid LOCF gap fill (explode == output)
    "tpch_q3",         # plan-DSL 3-table join + decimal revenue top-10
    "tpch_q5",         # plan-DSL 6-way join, two-var key, broadcast dims
    "tpch_q4",         # plan-DSL semijoin (EXISTS) + var-var lateness filter
    "tpch_q12",        # plan-DSL ship-window join + CASE priority split
    "tpch_q19",        # plan-DSL disjunction as Union of pushed-filter joins
    "tpch_q6",         # plan-DSL pure pushed-filter scan + global decimal sum
    "tpch_q10",        # plan-DSL 4-way join + top-20 TakeOrdered
    "tpch_q14",        # plan-DSL promo ratio (exact sums, one double div)
    "tpch_q18",        # plan-DSL HAVING as pre-join aggregate + filter
    "tpch_q1",         # plan-DSL full 8-agg pricing summary
    "tpch_q7",         # plan-DSL nation-pair disjunction as Union of joins
    "tpch_q8",         # plan-DSL 7-join market-share chain
    "tpch_q13",        # plan-DSL count-distribution (agg + antijoin zeros)
    "tpch_q15",        # plan-DSL top supplier (join on the aggregate value)
    "tpch_q17",        # plan-DSL avg-qty correlated filter via Transform ADDs
    "tpch_q21",        # plan-DSL exists/not-exists as two-level count chains
    "tpch_q22",        # plan-DSL scalar-avg broadcast + antijoin
    "retrieval_eval",  # MRR/nDCG@10 against label ground truth
    "anomalies",       # rolling z-score outliers (partitioned window)
    "winsorize",       # per-group nearest-rank percentile clamp
    "sessionize",      # gaps-and-islands session stats (partitioned window)
    "funnel",          # ordered 3-step funnel (per-key equi-join chain)
    "retention",       # daily cohort retention (two uniform-key shuffles)
    "fuzzy_match",     # symmetric-deletion blocked edit-distance join (r9)
    "fuzzy_groups",    # entity resolution: fuzzy pairs -> closure (r9)
    "graph_scc",       # FW-BW strongly connected components (r9)
    "minhash_est",     # MinHash estimator-vs-exact quality eval (r9)
    "c4_rules",        # C4 line-structural cleaning (map-only) (r9)
    "lsh_pr",          # banding precision/recall vs exact join (r9)
    "text_norm",       # canonicalization before hash-dedup (map-only) (r9)
    "link_pred",       # Resource-Allocation link prediction, capped wedges (r9)
    "dedup_keep_best",  # quality-aware near-dup survivor selection (r9)
    "changepoint",     # two-sided mean-shift drift profile (r9)
    "hard_negatives",  # different-label top-k mining (contrastive) (r9)
    "embed_prune",     # prototypicality pruning (SemDeDup complement) (r9)
    "edge_support",    # per-edge triangle support (k-truss measure) (r9)
    "clustering_coef",  # per-node local clustering coefficient (r10)
    "cdc_chunks",      # content-defined chunking + chunk dedup signal (r10)
    "collocations",    # bigram lift/PMI phrase mining (r10)
    "vocab_coverage",  # Zipf coverage curve for tokenizer sizing (r10)
    "pca_top1",        # power-iteration top component + projections (r10)
    "trunc_recall",    # Matryoshka dim-truncation recall eval (r10)
    "mmr_rerank",      # MMR diversity re-ranking (r10)
    "assortativity",   # degree assortativity coefficient (r10)
    "attribution",     # last-touch conversion attribution (r10)
    "period_coalesce",  # temporal interval normalize (r10)
    "ngram_novelty",   # first-seen n-gram curriculum signal (r10)
    "cluster_sample",  # cluster-balanced quota subsampling (r10)
    "node_sim",        # neighborhood-Jaccard node similarity (r10)
    "window_count",    # count-based tumbling windows (r10)
    "ktruss",          # k-truss recount-and-peel (declared r11)
    "ewma",            # dyadic-exact EWMA smoothing (r11)
    "twap",            # time-weighted average (r11)
    "markov_trans",    # event-type transition matrix (r11)
    "burstiness",      # inter-arrival index of dispersion (r11)
    "rfm",             # banded RFM segmentation (r11)
    "hits",            # HITS hubs/authorities (r11)
    "ppr",             # personalized PageRank (r11)
    "knn_graph",       # mutual k-NN graph over k-means cells (r11)
    "readability",     # Flesch reading-ease proxies (r11)
    "langid_eval",     # language-ID confusion matrix (r11)
    "pivot_counts",    # long->wide pinned pivot (r11)
    "unpivot_metrics",  # wide->long Expand unpivot (r11)
    "agg_grouping_sets",  # explicit grouping-sets aggregate (r11)
    "top_paths",       # top-k 3-step event paths (r11 batch 2)
    "seasonality",     # day-of-week profile (r11 batch 2)
    "group_quantiles",  # per-source log-bucket quantiles (r11 batch 2)
    "label_noise",     # kNN majority-label noise detection (r11 batch 2)
]


def host_speed_probe(spark) -> float:
    """Mechanical host-speed index (VERDICT r9 #3): the wall of a
    PINNED synthetic probe suite — fixed row counts, fixed partition
    counts, no testdata dependence — so cross-round totals normalize
    by ratio instead of prose disclosure (the r9 final record rode a
    uniformly ~1.3-1.5x slower container window; kmeans spot-checks
    were the only evidence). Three probes cover the three cost axes:
    codegen arithmetic throughput, hash/string throughput, and one
    real shuffle. One UNTIMED warmup pass first (the probe's own
    codegen compile otherwise lands in the first block's sample — the
    first r10 record read 5.6 cold vs 3.7 hot in the same window),
    then TWICE timed keeping the faster sample (a one-off container
    stall must not redefine the round's index); ~1.3s on an idle
    host. NEVER change these shapes — the index is only comparable
    across rounds while the suite is frozen."""

    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        # 1. codegen arithmetic: 16M-row fold, 32 fixed partitions
        spark.range(0, 16_000_000, 1, 32).selectExpr(
            "sum(id * 3 + (id % 7)) AS s"
        ).collect()
        # 2. hash/string: md5 over 2M rows
        spark.range(0, 2_000_000, 1, 32).selectExpr(
            "max(md5(CAST(id AS STRING))) AS m"
        ).collect()
        # 3. shuffle: 4M rows -> 100k keys -> count -> max
        spark.range(0, 4_000_000, 1, 32).groupBy(
            (F.col("id") % 100000).alias("k")
        ).count().selectExpr("max(count) AS c").collect()
        return time.perf_counter() - t0

    once()  # untimed codegen/JIT warmup of the probe shapes
    return round(min(once(), once()), 3)


def parallel_scale_probe(spark) -> float:
    """Pinned PARALLEL-scaling probe (VERDICT r12 #1): a fixed-size,
    embarrassingly-parallel CPU-bound job — 64 equal partitions of
    pure codegen arithmetic, no shuffle, no data dependence — whose
    wall scales ~linearly with the executor core count until the
    task count (64) is the limit. The driver runs the bench at two
    core counts; the RATIO of this probe's walls is the evidence that
    `local[$SPARK_GRAFT_CPUS]` is honored (the per-query ratios sit
    at ~1 because 145 queries at 17 MB are per-job-overhead bound —
    r12's `suspect_cpus_ignored` flag fired on exactly that). md5
    over 48M rows: ALU/stall-heavy, so it scales across SMT threads
    where pure codegen arithmetic saturates the physical pipelines
    (calibrated on this host: md5 2.5x for a 32-vs-8 core ratio vs
    1.85x for a range-sum kernel; ~0.9 s at 32 cores). Min of two
    (same one-off-stall policy as host_speed_probe); one untimed
    warmup compiles the codegen outside the samples. NEVER change the
    shape — the probe is only meaningful while frozen."""

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, 48_000_000, 1, 64).selectExpr(
            "max(md5(CAST(id AS STRING))) AS m"
        ).collect()
        return time.perf_counter() - t0

    once()
    return round(min(once(), once()), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # 1-minute load average SAMPLED AT STARTUP — ambient host load, not
    # the bench's own: recorded so regressions aren't chased through
    # noise (idle-host reruns measured ~6% faster than driver runs in
    # r5).
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None

    from declarative_dataflow_spark.session import build_session

    spark = build_session("bench")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # Warm the JVM, parquet footers, engine catalog, and whole-stage
    # codegen with queries NOT in the timed set and with 2-row
    # synthetic inputs (compiles the same expression trees; results of
    # the timed queries are never computed or cached) — the timings
    # then reflect steady-state throughput, which is what scales.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    for warm in ("match_ea", "agg_min"):
        if warm in qs:
            qs[warm](spark, sf_dir).count()
    from declarative_dataflow_spark.operators import dedup, similarity

    tiny_docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "b c d e f")], ["doc_id", "text"]
    )
    dedup.minhash_lsh_pairs(tiny_docs).count()
    dedup.simhash(tiny_docs).count()
    tiny_emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    similarity.cosine_topk(tiny_emb, [0], k=1).count()
    similarity.lsh_topk(tiny_emb, [0], k=1, planes=6).count()

    retimes: dict[str, dict[str, list[float]]] = {}
    # Host-speed index sampled once per timed block (keyed by block
    # dir); the pre-primary sample is the record's headline index.
    host_index: dict[str, float] = {}

    # Previous committed per-query records (this file's own last
    # committed output): any query that comes in >2x its prior record
    # gets a second sample even if it isn't among the block's ten
    # slowest — r8's wco_clique4 sat at 3x its r5 wall just OUTSIDE
    # the slowest-ten net and shipped un-retimed (VERDICT r8 #2).
    prior: dict[str, dict[str, float]] = {"primary": {}, "sf1": {}}
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
            )
        ) as fh:
            _prev = json.load(fh)
        prior["primary"] = _prev.get("queries", {}) or {}
        prior["sf1"] = (_prev.get("sf1") or {}).get("queries", {}) or {}
    except Exception:
        pass

    # Fixed sentinel keys (VERDICT r12 #8): a stable cross-round set the
    # compact line always carries, so the driver's round-over-round
    # comparison never manufactures "dropped" rows when a key gets fast
    # enough to fall out of the slowest-10 digest (r12's kmeans/
    # embed_prune/ngram_lm_score phantom drops). NEVER change this list.
    SENTINELS = [
        "tclosure", "graph_cc", "kmeans", "lsh_pr", "tpch_q21",
        "ngram_lm_score", "bm25_topk", "dup_spans", "shortest_cost",
        "semdedup",
    ]
    scale_probe: dict[str, float] = {}

    def time_block(block_dir: str) -> dict[str, float]:
        blk = "primary" if block_dir == sf_dir else "sf1"
        host_index[blk] = host_speed_probe(spark)
        scale_probe[blk] = parallel_scale_probe(spark)
        out: dict[str, float] = {}
        for name in HEADLINE:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            qs[name](spark, block_dir).count()
            out[name] = round(time.perf_counter() - t0, 3)
            # Scratch localCheckpoint blocks (minhash shingle sets,
            # fixpoint rounds) are reaped by the ContextCleaner only
            # after a DRIVER GC enqueues their weak refs; left alone
            # across the 83-query marathon they squeezed the single
            # local-mode JVM until every later query paid a uniform
            # ~1.3-1.5x tax (the r7 drift). One forced GC between
            # timed queries is outside every timing window and safe —
            # no tasks are in flight, so no accumulator updates can be
            # dropped (a mid-query periodic GC sprays 'non-existent
            # accumulator' errors for completed-plan metrics).
            spark.sparkContext._jvm.System.gc()
        # The DECLARED embed_neardup query IS the density-adjusted
        # form now (planes = ceil(log2(n/32)) derived from the corpus
        # count in both engines, r6) — the key keeps its trend name.
        t0 = time.perf_counter()
        qs["embed_neardup"](spark, block_dir).count()
        out["embed_neardup_scaled"] = round(time.perf_counter() - t0, 3)
        # Output-bound WCO stress row: the 4-clique over a ~3x denser
        # edge set (the instance the pre-r6 scaler created by
        # accident; now a deliberate, labeled row — the scaler itself
        # is topology-preserving since r6).
        t0 = time.perf_counter()
        entry_mod.q_wco_clique4_dense(spark, block_dir).count()
        out["wco_clique4_dense"] = round(time.perf_counter() - t0, 3)

        # Stall-robust second pass: single-shot timings on this host
        # show random 4-6x multi-second stalls (container CPU/IO
        # throttle windows) that land on DIFFERENT queries each run —
        # tpch_q4 24.3s in one idle run, <5s isolated and in the next
        # run, while ngram_lm_score swings 8s<->33s the opposite way.
        # The ten slowest queries get ONE retime and keep their best;
        # both samples are recorded in BENCH_LOCAL.json so a genuine
        # regression (slow BOTH times) is still visible, while a
        # one-off stall stops polluting the headline total.
        runner = {n: qs[n] for n in HEADLINE if n in qs}
        runner["embed_neardup_scaled"] = qs["embed_neardup"]
        runner["wco_clique4_dense"] = entry_mod.q_wco_clique4_dense
        block_retimes: dict[str, list[float]] = {}
        prev_map = prior["primary" if block_dir == sf_dir else "sf1"]
        regressed = [
            n
            for n, t in out.items()
            if n in prev_map and prev_map[n] > 0 and t > 2 * prev_map[n]
        ]
        to_retime = list(
            dict.fromkeys(
                sorted(out, key=out.get, reverse=True)[:10] + regressed
            )
        )
        for name in to_retime:
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            runner[name](spark, block_dir).count()
            second = round(time.perf_counter() - t0, 3)
            block_retimes[name] = [out[name], second]
            out[name] = min(out[name], second)
        retimes[block_dir] = block_retimes
        # POST-block probe (VERDICT r10 #2b): the pre-block sample
        # cannot see a throttle storm that starts mid-block — r10's
        # shipped record probed 2.245 yet ran 1.39x FASTER than the
        # driver's probe-1.815 window. The pre/post PAIR brackets the
        # block; a post much slower than pre flags in-block weather.
        host_index[
            ("primary" if block_dir == sf_dir else "sf1") + "_post"
        ] = host_speed_probe(spark)
        return out

    timings = time_block(sf_dir)

    # Incremental maintenance latency: one 100-datom epoch of triangle
    # delta pipelines against a LARGE graph snapshot (10k nodes, ~E
    # edges at this sf), vs a full recompute of the same query on the
    # same graph — the epoch cost tracks the change, the recompute the
    # state.
    from pyspark.sql import functions as F

    from declarative_dataflow_spark.engine import Datom
    from declarative_dataflow_spark.operators.wco import triangle_count_wco
    from declarative_dataflow_spark.plan.plans import AttributeBinding
    from declarative_dataflow_spark.streaming.incremental import DeltaJoin

    raw_edges = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id % 10000 AS src", "event_id % 10000 AS dst")
        .distinct()
    )
    # Retime discipline for the incremental block (VERDICT r10 #2a):
    # these two run OUTSIDE the per-query loop, and single-shot they
    # ship storm artifacts as the headline slowest entry (r10's driver
    # record: incremental_epoch 14.15s vs 1.39s shipped — pure
    # weather). Both are min-of-two ALWAYS, both samples recorded in
    # retimes like every other retimed query.
    inc_retimes = retimes.setdefault(sf_dir, {})

    def _recompute_once() -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        triangle_count_wco(raw_edges).count()
        return round(time.perf_counter() - t0, 3)

    rec = [_recompute_once(), _recompute_once()]
    inc_retimes["triangle_large_recompute"] = rec
    timings["triangle_large_recompute"] = min(rec)

    dj = DeltaJoin(
        spark,
        ["?a", "?b", "?c"],
        [
            AttributeBinding("?a", "edge", "?b"),
            AttributeBinding("?b", "edge", "?c"),
            AttributeBinding("?a", "edge", "?c"),
        ],
        initial={
            "edge": raw_edges.selectExpr(
                "src AS e", "dst AS v", "CAST(1 AS BIGINT) AS diff"
            )
        },
    )
    dj.transact(
        [Datom.add(i % 10000, "edge", (i * 7 + 1) % 10000) for i in range(100)]
    ).count()  # warm epoch
    # min-of-two over two DISTINCT 100-datom epochs (an epoch mutates
    # delta-join state, so the same datoms can't be replayed — a
    # second fresh epoch is the same workload shape and cost model).
    epochs = []
    for salt in (3, 13):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        dj.transact(
            [
                Datom.add((i * salt) % 10000, "edge", (i * 11 + salt + 2) % 10000)
                for i in range(100)
            ]
        ).count()
        epochs.append(round(time.perf_counter() - t0, 3))
    inc_retimes["incremental_epoch"] = epochs
    timings["incremental_epoch"] = min(epochs)
    # bracket the incremental block the way time_block brackets its
    # own queries — primary_post landed before this block ran.
    host_index["incremental_post"] = host_speed_probe(spark)

    total = round(sum(timings.values()), 3)
    # Self-proving core-count contract (VERDICT r12 #1): the effective
    # master / parallelism / shuffle partitioning the session actually
    # ran with, read back from the live context — not echoed env vars.
    sc = spark.sparkContext
    contract = {
        "master": sc.master,
        "defaultParallelism": sc.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "env_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    }
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load1": load1,
        "contract": contract,
        # Fixed-size parallel CPU probe per block: its wall across the
        # driver's two core-count runs is the scaling evidence the
        # per-query ratios can't provide at 17 MB (see
        # parallel_scale_probe).
        "scale_probe": scale_probe,
        # Pinned synthetic probe walls per block (see host_speed_probe)
        # — divide two rounds' totals by their host_index ratio to
        # compare across container-speed windows. Since r11 each block
        # ships a PRE and POST probe ("<block>" / "<block>_post"): a
        # pre-block sample alone cannot see a mid-block throttle storm
        # (r10's shipped probe 2.245 ran 1.39x faster than the
        # driver's probe-1.815 window).
        "host_index": host_index,
        "retimes": retimes,
        # Methodology marker (ADVICE r8): totals since r8 keep
        # min-of-two for retimed queries, so naive comparison against
        # pre-r8 single-shot totals overstates the improvement; both
        # samples of every retime are in `retimes`.
        "timing_policy": (
            "min-of-two for each block's 10 slowest plus any query "
            ">2x its previous committed record; the incremental block "
            "(triangle_large_recompute, incremental_epoch) is always "
            "min-of-two; single-shot otherwise"
        ),
    }

    # -- sf1 block: the same headline queries at 10x the data --------
    # Enabled by default when benching the standard sf0.1 dir; disable
    # with SPARK_GRAFT_SF1=0, point elsewhere with SPARK_GRAFT_SF1_DIR.
    # The 10x replica is built once (tools/scale_testdata.py) and
    # reused; any failure here never breaks the primary metric.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_scale/sf1")
    want_sf1 = (
        os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
        and sf_dir.rstrip("/").endswith("sf0.1")
    )
    if want_sf1:
        try:
            # embeddings.parquet is the LAST table scale() writes, so its
            # presence proves a COMPLETE build (gating on an earlier
            # table would skip the rebuild of a half-finished dir forever).
            if not os.path.exists(f"{sf1_dir}/embeddings.parquet"):
                sys.path.insert(
                    0, os.path.join(os.path.dirname(__file__), "tools")
                )
                from scale_testdata import scale  # type: ignore

                scale(spark, sf_dir, sf1_dir, 10)
            sf1_timings = time_block(sf1_dir)
            result["sf1"] = {
                "value": round(sum(sf1_timings.values()), 3),
                "queries": sf1_timings,
                "sf": 1.0,
            }
        except Exception as exc:  # the primary metric must survive
            result["sf1_error"] = str(exc)[:200]

    # The r7 driver record came back `"parsed": null`: 83 queries x two
    # scale factors outgrew the driver's tail capture and the single
    # JSON line truncated mid-object. So the FULL per-query result is
    # written to BENCH_LOCAL.json (committed artifact, the auditable
    # record) and the printed line is a compact digest: totals per sf,
    # load, and the slowest 10 queries per block — small enough that
    # tail capture can never lose the headline metric again.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
        "w",
    ) as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")

    def slowest(qmap: dict[str, float], n: int = 10) -> dict[str, float]:
        return dict(
            sorted(qmap.items(), key=lambda kv: kv[1], reverse=True)[:n]
        )

    def sentinels(qmap: dict[str, float]) -> dict[str, float]:
        return {k: qmap[k] for k in SENTINELS if k in qmap}

    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": result["sf"],
        "load1": load1,
        "host_index": host_index,
        "contract": contract,
        "scale_probe": scale_probe,
        "n_queries": len(timings),
        "queries": slowest(timings),
        "sentinel": sentinels(timings),
        "full": "BENCH_LOCAL.json",
    }
    if "sf1" in result:
        compact["sf1"] = {
            "value": result["sf1"]["value"],
            "sf": 1.0,
            "n_queries": len(result["sf1"]["queries"]),
            "queries": slowest(result["sf1"]["queries"]),
            "sentinel": sentinels(result["sf1"]["queries"]),
        }
    elif "sf1_error" in result:
        compact["sf1_error"] = result["sf1_error"]
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
