"""Sequence packing for LLM training-data pipelines.

Beyond-reference extension (BASELINE.json north star): training
pipelines pack variable-length documents into fixed-token-budget
sequences to avoid padding waste. Exact bin packing is NP-hard and
inherently sequential; the scalable form used by real pipelines is
STREAMING packing — documents are sharded, each shard packs greedily
in a deterministic order, and a pack closes when the running token
total passes the budget.

Spark-first shape: one shuffle (repartition by shard via the window's
partition key), then a per-shard cumulative sum with a window
function — pure JVM-side expressions, no UDFs, mirrored exactly by
the DuckDB oracle. At 100 TB the shard count bounds per-task state:
each window partition holds |corpus| / shards rows and shards pack
independently in parallel; skew is impossible because shard
assignment is a uniform content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sampling import _h32


def seq_pack(
    docs: DataFrame,
    budget: int = 256,
    shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document a (shard, pack_id) so that consecutive
    documents within a shard share a pack until the token budget is
    exhausted: (doc_id, n_tokens, shard, pack_id).

    pack_id = floor((running token total BEFORE this doc) / budget):
    a pack absorbs documents while its cumulative start offset is
    inside the current budget window, so every pack except a shard's
    last holds >= budget tokens once closed (documents longer than the
    budget occupy packs alone). Deterministic in (id, shards, budget).
    """

    n_tokens = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    df = docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.pmod(
            _h32(F.concat(F.lit("pack_"), F.col(id_col).cast("string"))),
            F.lit(shards),
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return df.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
    )


def seq_pack_oracle_sql(
    budget: int = 256, shards: int = 32, table: str = "documents"
) -> str:
    """The DuckDB twin of :func:`seq_pack` (same hash, same window)."""

    h = "('0x' || substr(md5('pack_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    return (
        "WITH toks AS (SELECT doc_id, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, "
        f"{h} % {shards} AS shard FROM {table}) "
        "SELECT doc_id, n_tokens, shard, "
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tokens) "
        f"/ {budget}) AS BIGINT) AS pack_id FROM toks"
    )

def chunk_docs(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style overlapping token-window chunking: each document
    splits into windows of ``window`` tokens starting every ``stride``
    tokens (the last window may be shorter; whitespace-only documents
    produce no chunks). Returns (doc_id, chunk_id, start, n_tokens, h)
    where ``h`` is the md5 of the space-joined chunk — chunk identity
    without shipping chunk text through the gate.

    Scale shape: entirely map-side — split, ``sequence``-explode of
    the start offsets, ``slice``, hash; no shuffle, no window
    function, no driver traffic. Chunk count per task is bounded by
    the task's input bytes (each token lands in <= ceil(window/stride)
    chunks), so a 100 TB corpus chunks at scan speed.
    """

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
    )
    chunks = toks.select(
        id_col,
        "t",
        F.explode(
            F.sequence(
                F.lit(0), F.size("t") - 1, F.lit(stride)
            )
        ).alias("start"),
    )
    chunk = F.expr(f"slice(t, start + 1, {window})")
    return chunks.select(
        id_col,
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("h"),
    )
