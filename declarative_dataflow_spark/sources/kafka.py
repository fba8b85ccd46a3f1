"""Kafka datom source: the partitioned-broker scale path.

The reference's ``Sourceable`` trait is transport-pluggable
(src/sources/mod.rs:47-64). This module carries the Kafka projection:
``value`` bytes hold one JSON datom ``{e, a, v, t, diff}`` — the same
wire shape as ``stream_datom_source`` and the socket source — so the
downstream attribute routing and ``DeltaJoin.transact_frame`` pipeline
are identical across transports.

The container this repo develops in has NO Kafka connector jars, so
``stream_kafka_datoms`` raises a directed error if the connector is
absent; the pure value→datom projection (``decode_datom_values``) is
transport-independent and unit-tested on static frames. On a real
cluster, add ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13``
and this source parallelizes the scan per topic partition — the scale
story file streams and sockets cannot offer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def decode_datom_values(
    values: DataFrame, value_col: str = "value", v_type: str = "string"
) -> DataFrame:
    """Project a frame of JSON datom payloads (binary or string
    ``value`` column — Kafka's wire schema) to (e, a, v, t, diff).
    Null e/a rows (malformed JSON) are dropped, matching the socket
    source's tolerance."""

    parsed = values.select(
        F.from_json(
            F.col(value_col).cast("string"),
            f"e long, a string, v {v_type}, t long, diff long",
        ).alias("d")
    )
    return (
        parsed.select("d.e", "d.a", "d.v", "d.t", "d.diff")
        .filter(F.col("e").isNotNull() & F.col("a").isNotNull())
        .withColumn("diff", F.coalesce("diff", F.lit(1)))
    )


def stream_kafka_datoms(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    v_type: str = "string",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming (e, a, v, t, diff) datoms from a Kafka topic. Same
    output schema as ``stream_datom_source``; requires the
    spark-sql-kafka connector jars on the classpath."""

    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - depends on jars
        raise RuntimeError(
            "Kafka connector not on the classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (the datom projection itself is "
            "decode_datom_values and is transport-independent)"
        ) from exc
    return decode_datom_values(raw, "value", v_type)
