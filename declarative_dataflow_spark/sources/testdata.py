"""Catalog setup for the driver's TPC-H-ish testdata.

Maps the parquet tables at ``/root/testdata/sf*/`` into the engine's
attribute model (the reference's per-attribute collections,
docs/adr/0002-data-model.md): every keyed table contributes one
attribute per non-key column, entity = the table's primary key.
``lineitem`` has no unique key in this data, so it is registered as a
plain table for ``Scan`` leaves.

All attributes are lazy column-pruned parquet views — reading one
attribute reads exactly two columns (Catalyst pushes the projection to
the parquet scan), and Hector fuses same-entity attributes back into a
single scan, so the attribute model costs nothing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..engine import Engine

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# table -> (entity key expr, {attribute id: value column})
ATTRIBUTES: dict[str, tuple[str, dict[str, str]]] = {
    "region": ("r_regionkey", {"region/name": "r_name"}),
    "nation": (
        "n_nationkey",
        {"nation/name": "n_name", "nation/regionkey": "n_regionkey"},
    ),
    "customer": (
        "c_custkey",
        {
            "customer/name": "c_name",
            "customer/nationkey": "c_nationkey",
            "customer/acctbal": "c_acctbal",
            "customer/mktsegment": "c_mktsegment",
        },
    ),
    "supplier": (
        "s_suppkey",
        {
            "supplier/name": "s_name",
            "supplier/nationkey": "s_nationkey",
            "supplier/acctbal": "s_acctbal",
        },
    ),
    "part": (
        "p_partkey",
        {
            "part/name": "p_name",
            "part/brand": "p_brand",
            "part/type": "p_type",
            "part/size": "p_size",
            "part/retailprice": "p_retailprice",
        },
    ),
    "orders": (
        "o_orderkey",
        {
            "orders/custkey": "o_custkey",
            "orders/status": "o_orderstatus",
            "orders/totalprice": "o_totalprice",
            "orders/date": "o_orderdate",
            "orders/priority": "o_orderpriority",
        },
    ),
    "events": (
        "event_id",
        {
            "event/ts": "ts",
            "event/user": "user_id",
            "event/type": "event_type",
            "event/value": "value",
        },
    ),
    "documents": (
        "doc_id",
        {
            "doc/text": "text",
            "doc/lang": "lang",
            "doc/source": "source",
            "doc/nchars": "n_chars",
        },
    ),
    "embeddings": (
        "vec_id",
        {"emb/vector": "embedding", "emb/label": "label"},
    ),
}


# Columns stored as TIMESTAMP(NANOS) in the testdata parquet. Spark has
# no nanosecond timestamp type; with spark.sql.legacy.parquet.nanosAsLong
# they read as LONG nanos and are converted to microsecond timestamps
# here (matching what DuckDB sees).
NANOS_TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def _ensure_session_defaults(spark: SparkSession) -> None:
    """Make table loading robust to sessions we did not build (the
    driver may hand ``entry``/``queries`` a bare SparkSession): the
    testdata parquet carries TIMESTAMP(NANOS) which needs the
    nanosAsLong legacy read, and the DuckDB oracle compares timestamps
    in UTC."""

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    _ensure_session_defaults(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANOS_TS_COLUMNS.get(name, []):
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
            )
    return df


def load_engine(spark: SparkSession, sf_dir: str) -> Engine:
    """Build an Engine whose catalog exposes the testdata at ``sf_dir``."""

    engine = Engine(spark)
    for t in TABLES:
        engine.register_table(t, load_table(spark, sf_dir, t))
    for t, (e_expr, mapping) in ATTRIBUTES.items():
        engine.register_table_attributes(t, e_expr, mapping)
    return engine
