"""Streaming training-data curation: the batch pipeline operators
applied to unbounded document streams.

The batch operators (operators/text.py, operators/dedup.py) are pure
column expressions, so they lift to Structured Streaming unchanged —
this module packages the stateful pieces:

- ``stream_exact_dedup``: keep the first occurrence of each content
  hash. State is one hash per distinct document;
  ``dropDuplicatesWithinWatermark`` bounds it by event time when a
  watermark column is provided (late duplicates beyond the watermark
  are the same trade every streaming dedup makes).
- ``stream_curate``: quality/language/repetition filtering + PII
  scrubbing as a map-only streaming stage (no state at all).

At 100 TB/day the dedup state is the bottleneck to plan for: the
content hash is 32 bytes/doc in the state store (RocksDB provider via
``build_session(rocksdb_state=True)``), sharded by hash — uniform by
construction, no skew.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators import dedup as dedup_ops
from ..operators import text as text_ops


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    time_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence-wins exact dedup on a document stream.

    With ``time_col`` the state is bounded: duplicates arriving within
    the watermark window dedup exactly; older ones age out of state.
    Without it, state grows with distinct documents (exact, unbounded
    — the batch-parity mode).
    """

    hashed = stream.withColumn("__h", F.md5(F.col(text_col)))
    if time_col is not None:
        return hashed.withWatermark(time_col, watermark) \
            .dropDuplicatesWithinWatermark(["__h"]).drop("__h")
    return hashed.dropDuplicates(["__h"]).drop("__h")


class StreamNearDedup:
    """Streaming MinHash-LSH near-duplicate suppression: keep the
    first-accepted document of every near-duplicate cluster across an
    unbounded stream.

    The accumulated state is the ACCEPTED documents' MinHash
    signatures — k longs per document, fixed-width regardless of
    document size — persisted as parquet under ``state_dir`` (at
    cluster scale: a Delta/iceberg table on object storage). Each
    micro-batch:

    1. computes batch signatures (map-only, reference:
       operators/dedup.py linear-permutation MinHash);
    2. derives LSH band keys from batch AND state signatures (a row-
       local map on read — only signatures are ever stored);
    3. joins batch keys against state keys (uniform band-hash keys, no
       skew) and against themselves for in-batch pairs;
    4. estimates similarity per candidate pair ROW-LOCALLY as the
       fraction of equal signature components (the standard MinHash
       Jaccard estimator — no shingle sets are stored or shuffled);
    5. drops batch docs whose estimate >= threshold against an
       accepted doc, resolves in-batch pairs greedily (lower doc_id
       wins — one pass, no component iteration; a doc dropped for a
       batch-internal twin whose own twin was itself dropped is the
       documented greedy over-suppression trade);
    6. appends survivors' signatures to the state and emits them.

    Per-epoch work tracks the batch: state is touched only via the
    band-key join (batch keys x state index), never rescanned in full
    per document.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        k: int = 16,
        bands: int = 4,
        n: int = 3,
        threshold: float = 0.5,
        text_col: str = "text",
    ) -> None:
        if k % bands != 0:
            raise ValueError("bands must divide k")
        self.spark = spark
        self.state_dir = state_dir
        self.k, self.bands, self.n = k, bands, n
        self.threshold = threshold
        self.text_col = text_col

    # -- helpers -----------------------------------------------------
    def _band_keys(self, sigs: DataFrame) -> DataFrame:
        rows = self.k // self.bands
        return sigs.select(
            "doc_id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.xxhash64(
                            F.lit(bi),
                            F.slice(F.col("sig"), bi * rows + 1, rows),
                        )
                        for bi in range(self.bands)
                    ]
                )
            ).alias("key"),
        )

    def _est(self, a: str, b: str) -> Column:
        """Row-local MinHash Jaccard estimate: mean equal components."""

        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)), "
            f"0, (acc, v) -> acc + v) / {self.k}"
        )

    def _state(self, exclude_epoch: Optional[int] = None) -> Optional[DataFrame]:
        try:
            df = self.spark.read.parquet(self.state_dir)
        except Exception:
            return None
        if exclude_epoch is not None and "epoch" in df.columns:
            # A RETRIED micro-batch must not dedup against its own
            # prior contribution — it would drop every doc and then
            # overwrite its epoch directory with nothing.
            df = df.filter(F.col("epoch") != exclude_epoch)
        return df

    # -- one epoch ---------------------------------------------------
    def process_batch(
        self, batch: DataFrame, epoch: Optional[int] = None
    ) -> DataFrame:
        """Run one micro-batch: returns the accepted (deduped) rows of
        ``batch`` and appends their signatures to the state. Callable
        directly for batch-mode backfills; ``attach`` wires it into
        foreachBatch.

        With ``epoch`` set (the foreachBatch path), the signature
        append goes to an epoch-keyed subdirectory with overwrite, so
        a retried micro-batch REPLACES its own state contribution
        instead of duplicating it — exactly-once state under Spark's
        at-least-once foreachBatch retries. Use one mode consistently
        per state_dir (epoch-keyed dirs and flat appends don't mix in
        one parquet listing)."""

        sigs = dedup_ops.minhash_signatures(
            batch, self.k, self.n, self.text_col
        ).localCheckpoint(eager=True)  # one hashing pass, reused 3x
        banded = self._band_keys(sigs)

        dropped = None
        state = self._state(exclude_epoch=epoch)
        if state is not None:
            vs_state = (
                banded.join(
                    self._band_keys(state).select(
                        "key", F.col("sig").alias("ssig")
                    ),
                    "key",
                )
                .filter(self._est("sig", "ssig") >= self.threshold)
                .select("doc_id")
                .distinct()
            )
            dropped = vs_state
        internal = (
            banded.select("key", F.col("doc_id").alias("a"), F.col("sig").alias("asig"))
            .join(
                banded.select(
                    "key", F.col("doc_id").alias("b"), F.col("sig").alias("bsig")
                ),
                "key",
            )
            .filter(F.col("a") < F.col("b"))
            .filter(self._est("asig", "bsig") >= self.threshold)
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )
        dropped = internal if dropped is None else dropped.union(internal).distinct()

        kept = batch.join(dropped, "doc_id", "left_anti")
        kept_sigs = sigs.join(dropped, "doc_id", "left_anti")
        # Docs too short to form a single n-gram have no signature and
        # pass through unexamined; only signatured survivors enter state.
        if epoch is not None:
            kept_sigs.write.mode("overwrite").parquet(
                f"{self.state_dir}/epoch={epoch}"
            )
        else:
            kept_sigs.write.mode("append").parquet(self.state_dir)
        return kept

    # -- streaming wiring --------------------------------------------
    def attach(
        self,
        stream: DataFrame,
        sink: Callable[[DataFrame, int], None],
        checkpoint: str,
        query_name: str = "near_dedup",
    ):
        """Run the suppression on a streaming DataFrame: each
        micro-batch is deduped against all previously-accepted
        documents, then handed to ``sink(kept_df, epoch_id)``."""

        def _on_batch(df: DataFrame, epoch: int) -> None:
            sink(self.process_batch(df, epoch=epoch), epoch)

        return (
            stream.writeStream.foreachBatch(_on_batch)
            .queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .start()
        )


def stream_curate(
    stream: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.2,
    max_repetition: float = 0.9,
    require_lang: bool = True,
    gopher: dict | None = None,
    blocklist: list[str] | None = None,
    entropy_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Map-only streaming curation stage: quality score, language ID,
    repetition ratio, PII scrubbing — and, when ``gopher`` is given
    (a dict of gopher_columns threshold overrides, ``{}`` for the
    paper's defaults), the Gopher A1.1 word-level gate; when
    ``blocklist`` is given, the word-delimited badwords gate (the
    row-local arrays_overlap form — zero joins, right for gate-sized
    lists); when ``entropy_band`` is given, the (lo, hi) char-entropy
    keep-band — all composed as ONE projection (raw Column
    expressions, no self-joins — a streaming self-join would demand
    watermarks and state for what is purely map work). Zero state;
    fuses into the micro-batch scan."""

    out = stream.select(
        "*",
        text_ops.quality_columns(text_col)["quality"].alias("quality"),
        text_ops.lang_id_column(text_col).alias("lang_pred"),
        text_ops.repetition_ratio_column(text_col).alias("rep_ratio"),
        text_ops.redact_column(text_col).alias("__redacted"),
    ).filter(
        (F.col("quality") >= min_quality)
        & (F.col("rep_ratio") <= max_repetition)
    )
    if require_lang:
        out = out.filter(F.col("lang_pred") != "und")
    if gopher is not None:
        out = out.filter(
            text_ops.gopher_columns(text_col, **gopher)["pass"]
        )
    if blocklist is not None:
        out = out.filter(~text_ops.blocklist_column(blocklist, text_col))
    if entropy_band is not None:
        lo, hi = entropy_band
        ent = text_ops.char_entropy_column(text_col)
        out = out.filter((ent >= lo) & (ent <= hi))
    return out.drop(text_col).withColumnRenamed("__redacted", text_col)
