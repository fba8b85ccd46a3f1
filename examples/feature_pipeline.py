"""Event-stream feature engineering walkthrough: the point-in-time
feature table a training job joins against, built with the
time-series operator family.

Composes over the driver testdata's event log: per-user trailing
rolling statistics (RANGE window, partitioned per key) -> purchase
attribution via the bucketized interval join (equi-join on
(user, time-bucket) + residual filter — never a nested loop) ->
point-in-time as-of features (union + window, NO Join operator in the
plan: each click sees the latest prior purchase value, the
training-serving-skew guard) -> session/funnel/retention context
(gaps-and-islands labels, ordered completion depths, cohort rollup)
-> a Z-order clustered layout so readers filtering on either
(user, time) dimension prune files by parquet min/max stats.

Run: python examples/feature_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from declarative_dataflow_spark import layout
from declarative_dataflow_spark.operators import timeseries
from declarative_dataflow_spark.operators.timeseries import _epoch_us
from declarative_dataflow_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("features", master="local[8]")
    from declarative_dataflow_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")

    # 1. Trailing per-user activity features (inclusive 1-hour RANGE).
    rolling = timeseries.rolling_stats(ev, window_seconds=3600)

    # 2. Attribution: clicks inside the 4h window after a same-user
    #    purchase (bucketized range join).
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("end"),
        "value",
    )
    attributed = timeseries.interval_join(
        clicks, purchases, on=["user_id"], bucket_seconds=4 * 3600
    )

    # 3. Point-in-time features: each click carries the latest
    #    purchase value AT ITS OWN EVENT TIME (no future leakage).
    asof = timeseries.asof_join(
        clicks,
        purchases.select("purchase_id", "user_id", F.col("start").alias("ts"), "value"),
        on=["user_id"],
        point_id_col="click_id",
        quote_id_col="purchase_id",
    )

    # 4. Session + conversion context: gaps-and-islands session labels
    #    joined onto the click features, funnel depth per user, daily
    #    cohort retention as the monitoring rollup.
    sess = timeseries.sessionize(ev, gap_seconds=1800).select(
        F.col("event_id").alias("click_id"), "session_seq"
    )
    depths = timeseries.funnel(ev, ["view", "click", "purchase"]).select(
        "user_id", "depth"
    )
    cohorts = timeseries.retention(ev, period_seconds=86_400)

    # 4b. Data-quality guards on the raw stream: regular-grid LOCF
    #     series for downstream windowing, rolling z-score outliers
    #     excluded from the training rows.
    grid = timeseries.resample_locf(ev, grid_seconds=3600)
    outliers = timeseries.rolling_zscore(
        ev, window_seconds=604_800, min_n=8, threshold=2.0
    ).select(F.col("event_id").alias("click_id"))

    # 5. Assemble + cluster the write on (user, hour) Z-order.
    feats = (
        asof.join(
            rolling.withColumnRenamed("event_id", "click_id").select(
                "click_id", "n_win", "avg_win"
            ),
            "click_id",
        )
        .join(sess, "click_id")
        .join(depths, "user_id", "left")
        .join(outliers, "click_id", "left_anti")
        .withColumn("u6", F.col("user_id") % 64)
        .withColumn(
            "h6", (F.floor(_epoch_us("ts") / 3_600_000_000) % 64)
        )
    )
    laid = layout.zorder_layout(feats, ["u6", "h6"], bits=6, partitions=8)

    print(f"events: {ev.count()}")
    print(f"rolling rows: {rolling.count()}")
    print(f"attributed clicks: {attributed.count()}")
    no_hist = asof.filter(F.col("asof_quote_id").isNull()).count()
    print(f"asof rows: {asof.count()} (no prior purchase: {no_hist})")
    full = depths.filter(F.col("depth") == 3).count()
    print(f"funnel: {depths.count()} users entered, {full} completed")
    print(f"retention cells: {cohorts.count()}")
    print(f"resampled grid rows: {grid.count()}")
    print(f"outlier events flagged (clicks among them excluded): {outliers.count()}")
    print(f"feature partitions: {laid.rdd.getNumPartitions()}")
    spark.stop()


if __name__ == "__main__":
    main()
