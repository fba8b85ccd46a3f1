"""End-to-end training-data pipeline: the beyond-reference operators
composing the way a real corpus-curation job chains them —
dedup -> quality filter -> token budget -> near-dup pruning over
embeddings. One flow, sf0.001 testdata, assertions on the funnel."""

import os

import pytest

from declarative_dataflow_spark.operators import dedup, similarity, text

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture
def corpus(spark):
    from declarative_dataflow_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "documents")


@pytest.fixture
def vectors(spark):
    from declarative_dataflow_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def test_curation_funnel(spark, corpus, vectors):
    n_docs = corpus.count()

    # 1. Exact dedup: keep each content hash's canonical doc.
    canon = dedup.exact_dedup_groups(corpus).select("canonical")
    kept = corpus.join(
        canon, corpus["doc_id"] == canon["canonical"]
    ).drop("canonical")
    n_exact = kept.count()
    assert 0 < n_exact <= n_docs

    # 2. Near-dup pruning: drop the higher id of each MinHash-LSH pair.
    pairs = dedup.minhash_lsh_pairs(kept, threshold=0.5)
    drop = pairs.select(pairs["b"].alias("doc_id")).distinct()
    kept = kept.join(drop, "doc_id", "left_anti")
    n_neardup = kept.count()
    assert 0 < n_neardup <= n_exact

    # 3. Quality + token filters compose on the survivors.
    scored = kept.join(text.quality_score(kept), "doc_id").join(
        text.token_count(kept), "doc_id"
    )
    final = scored.filter("quality > 0.2 AND n_tokens >= 5")
    n_final = final.count()
    assert 0 < n_final <= n_neardup

    # 4. Embedding near-dups among the survivors' vectors.
    surviving_vecs = vectors.join(
        final.select(final["doc_id"].alias("vec_id")), "vec_id", "semi"
    )
    nd = similarity.embedding_neardup(surviving_vecs, threshold=0.4)
    # Pairs reference surviving ids only.
    ids = {r["vec_id"] for r in surviving_vecs.select("vec_id").collect()}
    for r in nd.collect():
        assert r["a"] in ids and r["b"] in ids

    # The funnel is deterministic: same counts on a second run.
    assert final.count() == n_final
