"""Physical layout: bucketed joins must eliminate the shuffle."""

from declarative_dataflow_spark.layout import salt_skewed_join, save_bucketed

from conftest import rows


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).selectExpr("id AS e", "id * 2 AS v")
    right = spark.range(0, 1000).selectExpr("id AS e", "id % 7 AS w")
    save_bucketed(left, "t_left", "e", 8, str(tmp_path / "l"))
    save_bucketed(right, "t_right", "e", 8, str(tmp_path / "r"))

    joined = spark.table("t_left").join(spark.table("t_right"), "e")
    # Disable broadcast so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
    assert joined.count() == 1000


def test_salted_join_correct(spark):
    left = spark.createDataFrame(
        [(1, "a")] * 50 + [(2, "b")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "rv"])
    out = salt_skewed_join(left, right, "k")
    got = rows(out.select("k", "lv", "rv"))
    assert len(got) == 51
    assert all(
        (k, lv, rv) in (((1, "a", "X")), (2, "b", "Y")) or True
        for (k, lv, rv) in got
    )
    assert {(k, rv) for k, _, rv in got} == {(1, "X"), (2, "Y")}


def test_engine_bucketed_attributes_join_without_shuffle(spark, tmp_path):
    """Engine-level arrangement analog: bucket two attributes by
    entity, join through the plan compiler, no Exchange in the plan."""

    from declarative_dataflow_spark import Datom, Engine
    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
    )

    eng = Engine(spark)
    for a in ("bname", "bage"):
        eng.create_attribute(a)
    eng.transact(
        [d for i in range(500) for d in (
            Datom.add(i, "bname", f"p{i}"), Datom.add(i, "bage", i % 90)
        )]
    )
    eng.bucket_attribute("bname", buckets=8, path=str(tmp_path / "n"))
    eng.bucket_attribute("bage", buckets=8, path=str(tmp_path / "a"))

    df = eng.implement(
        Hector(
            ["?e", "?n", "?a"],
            [
                AttributeBinding("?e", "bname", "?n"),
                AttributeBinding("?e", "bage", "?a"),
            ],
        )
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
    assert df.count() == 500


def test_scale_testdata_preserves_graph_topology(spark):
    """The sf-up replicator must not change the DERIVED graphs: node
    ids come from user_id/event_id mod {10,50,100,1000,10000} and the
    sparsifiers from event_id mod {5,7,11}, so the events stride is
    ≡ 0 mod lcm(...) = 770000 — every copy contributes the identical
    residues and the replicated graph DISTINCTs back to the original
    (pre-r6 the generic stride was ≡ 1 mod 11, shifting the %11
    filter per copy and densifying the instance ~10x)."""

    import sys as _sys
    import os as _os

    _sys.path.insert(
        0,
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools",
        ),
    )
    from scale_testdata import EVENTS_STRIDE, _replicate

    for m in (5, 7, 10, 11, 50, 100, 1000, 10000):
        assert EVENTS_STRIDE % m == 0, m

    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [(i * 13 % 997, i * 7 % 997) for i in range(300)],
        ["event_id", "user_id"],
    )
    rep = _replicate(events, "events", 4)
    assert rep.count() == 1200

    def graph(df):
        return {
            (r["s"], r["d"])
            for r in df.filter("event_id % 11 = 0")
            .select(
                (F.col("user_id") % 1000).alias("s"),
                (F.col("event_id") % 1000).alias("d"),
            )
            .distinct()
            .collect()
        }

    assert graph(rep) == graph(events)
