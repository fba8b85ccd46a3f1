"""Network datom source over a TCP socket.

The reference's ``Sourceable`` trait is pluggable over arbitrary
transports (src/sources/mod.rs:47-64); its shipped sources are files
and logging streams, with brokers left to implementations. This
container has no Kafka connector jars, so the network transport here
is Structured Streaming's built-in ``socket`` source — no external
dependency — carrying one JSON datom ``{e, a, v, t, diff}`` per line,
exactly the ``stream_datom_source`` wire shape. Swapping in a Kafka
topic later is a one-line change (``format("kafka")`` + the same
``from_json`` projection), which is the point: the datom decoding and
attribute routing below are transport-agnostic.

Scale: the socket source is single-connection (driver-side receive) —
it is the development/parity transport. The scale path is a
partitioned broker (Kafka) or object-store file stream
(``stream_datom_source``), both of which parallelize the scan; the
downstream ``DeltaJoin.transact_frame`` pipeline is identical for all
three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_socket_datoms(
    spark: SparkSession,
    host: str,
    port: int,
    v_type: str = "string",
) -> DataFrame:
    """Streaming (e, a, v, t, diff) datoms from newline-JSON on a TCP
    socket. Same output schema as ``stream_datom_source``, so it plugs
    into ``stream_delta_join`` / attribute routing unchanged."""

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"e long, a string, v {v_type}, t long, diff long",
        ).alias("d")
    )
    return parsed.select("d.e", "d.a", "d.v", "d.t", "d.diff").filter(
        F.col("e").isNotNull() & F.col("a").isNotNull()
    )


def route_datoms_to_attributes(
    datoms: DataFrame, attributes: list[str]
) -> dict[str, DataFrame]:
    """Split a datom stream into per-attribute (e, v, t, diff) streams
    (the reference source contract: one stream per attribute,
    src/sources/mod.rs:55-63)."""

    return {
        a: datoms.filter(F.col("a") == a).select("e", "v", "t", "diff")
        for a in attributes
    }
