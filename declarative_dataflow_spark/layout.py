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


def zorder_key(
    cols: list[str], bits: int = 16
) -> "F.Column":
    """Z-order (Morton) key over integer columns: interleave the low
    ``bits`` bits of each column, first column in the highest lanes of
    each round. Sorting/range-partitioning a table by this key keeps
    rows that are close in EVERY dimension inside the same files, so
    parquet min/max stats prune scans filtered on ANY of the
    dimensions — the multi-dimensional clustering trick behind
    Delta/Iceberg OPTIMIZE ZORDER, available here as a plain column
    expression (pure bit arithmetic, map-only, engine-portable).

    Columns must already be non-negative integers (quantize doubles by
    bucketing first — e.g. floor-division of an epoch or a fixed-point
    value). n columns * ``bits`` bits must fit a signed 64-bit key:
    n * bits <= 62.
    """

    n = len(cols)
    if n * bits > 62:
        raise ValueError("zorder key exceeds 63 bits")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("long")
        for b in range(bits):
            # bit b of column j lands at position b*n + (n-1-j)
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - j),
                )
            )
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, partitions: int = 32
) -> DataFrame:
    """Range-partition and sort ``df`` by its Z-order key: the write
    layout whose per-file min/max ranges stay tight in every one of
    ``cols``. ``repartitionByRange`` samples the key distribution, so
    skewed dimensions still split evenly."""

    keyed = df.withColumn("__z", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
