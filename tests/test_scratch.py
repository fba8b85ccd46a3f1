"""The scratch-materialization router (declarative_dataflow_spark.
scratch): default = stock executor-local localCheckpoint; with
spark.declarativeDataflow.reliableScratch=true every scratch site in
the package routes through RELIABLE DataFrame.checkpoint instead
(cluster recompute-on-loss — the ADVICE r8 / VERDICT r9 #7 trade made
switchable)."""

import glob
import os

import pytest

from declarative_dataflow_spark import scratch


@pytest.fixture
def _flag_off(spark):
    """Always restore the default, whatever a test does."""

    yield
    spark.conf.set(scratch.RELIABLE_FLAG, "false")


def test_flag_switches_mechanism(spark, _flag_off):
    """Default: no checkpoint dir is ever set (stock localCheckpoint
    touches none). Flag on: the router sets a checkpoint dir and a
    reliable checkpoint's rdd-* artifacts land in it."""

    df = spark.range(64).selectExpr("id", "id * 3 AS v")

    spark.conf.set(scratch.RELIABLE_FLAG, "false")
    out = df.localCheckpoint(eager=True)
    assert out.count() == 64

    spark.conf.set(scratch.RELIABLE_FLAG, "true")
    out2 = df.localCheckpoint(eager=True)
    d = spark.sparkContext.getCheckpointDir()
    assert d is not None
    local = d.replace("file:", "")
    artifacts = glob.glob(os.path.join(local, "**", "rdd-*"), recursive=True)
    assert artifacts, f"no reliable checkpoint artifacts under {d}"
    assert out2.count() == 64


def test_operator_results_identical_under_reliable_scratch(
    spark, _flag_off
):
    """A representative scratch-heavy operator (minhash_lsh_pairs:
    shingle-set localCheckpoint feeding both sides of the band join)
    returns the IDENTICAL pair set under both mechanisms — the router
    changes durability, never semantics."""

    from declarative_dataflow_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different document about spark engines"),
            (3, "a completely different document about spark engines"),
        ],
        ["doc_id", "text"],
    )

    spark.conf.set(scratch.RELIABLE_FLAG, "false")
    base = sorted(tuple(r) for r in dedup.minhash_lsh_pairs(docs).collect())

    spark.conf.set(scratch.RELIABLE_FLAG, "true")
    routed = sorted(tuple(r) for r in dedup.minhash_lsh_pairs(docs).collect())

    assert routed == base and base, "router changed operator results"
