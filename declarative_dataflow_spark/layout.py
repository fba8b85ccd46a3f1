"""Physical layout utilities for cluster scale.

The reference maintains 1-6 index arrangements per attribute so joins
can reuse them (src/domain/mod.rs:475-536). Spark's analog of a shared
arrangement is a BUCKETED table: pre-hash-partitioned by the join key,
so co-bucketed joins skip the exchange entirely. These helpers
materialize attribute DataFrames in that layout and provide skew
salting for the keys bucketing can't fix.

At 100 TB: bucket the big fact attributes by entity once at ingest;
every subsequent entity-join (the dominant join shape in the
per-attribute data model) runs shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def save_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a DataFrame bucketed+sorted by ``key`` (the arrangement
    analog: equi-joins between tables bucketed on the same key and
    count skip their shuffles)."""

    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salt_skewed_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small) right side into
    ``salt`` replicas and scatter the left side's hot keys across them.

    Use when one key dominates (AQE skew-join handles sort-merge skew
    automatically; salting is for the cases AQE can't split, e.g.
    aggregations after the join). Both inputs keep their columns;
    the helper columns are dropped.
    """

    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt_arr", F.sequence(F.lit(0), F.lit(salt - 1))
    ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")
