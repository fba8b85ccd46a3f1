"""Streaming training-data curation walkthrough: the unbounded form of
examples/curation_pipeline.py.

A document stream flows through (1) the map-only quality/language/PII
stage, then per micro-batch through (2) MinHash near-dedup against all
previously-accepted documents (signature-index state), (3) benchmark
decontamination (broadcast eval n-grams), and (4) differentially-
maintained corpus statistics — duplicate-n-gram fractions and the
token vocabulary — whose per-epoch work tracks the batch, not the
corpus. A benchmark added mid-stream retroactively re-scores exactly
the affected documents.

Run: python examples/streaming_curation.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from declarative_dataflow_spark.operators import curation
from declarative_dataflow_spark.session import build_session
from declarative_dataflow_spark.streaming.corpus_stats import (
    IncrementalContamination,
    IncrementalDupNgram,
    IncrementalVocab,
)
from declarative_dataflow_spark.streaming.curation import (
    StreamNearDedup,
    stream_curate,
)


def main() -> None:
    spark = build_session("stream-curation", master="local[8]")
    work = tempfile.mkdtemp(prefix="stream_curation_")
    src = os.path.join(work, "in")
    os.mkdir(src)

    def feed(name: str, rows: list[dict]) -> None:
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    feed("b1.json", [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 3, "text": "mail bob@example.com about the fine fresh data for training"},
    ])
    feed("b2.json", [
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 5, "text": "this document is the most original of the fresh novel sources"},
    ])

    nd = StreamNearDedup(spark, os.path.join(work, "nd_state"))
    dng = IncrementalDupNgram(spark, os.path.join(work, "dng_state"))
    vocab = IncrementalVocab(spark, os.path.join(work, "vocab_state"))
    cont = IncrementalContamination(spark, os.path.join(work, "cont_state"))
    accepted: list[int] = []

    def stage(batch, epoch):
        deduped = nd.process_batch(batch, epoch=epoch)
        kept = deduped.localCheckpoint(eager=True)
        dng.process_batch(kept, epoch=epoch)
        vocab.process_batch(kept)
        cont.add_docs(kept)
        accepted.extend(r["doc_id"] for r in kept.select("doc_id").collect())

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream_curate(
            stream,
            blocklist=["click here", "lorem ipsum"],
            entropy_band=(1.0, 7.0),
        )
        .writeStream.foreachBatch(stage)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    print(f"accepted docs: {sorted(accepted)}")
    print("dup-ngram state:",
          sorted(tuple(r) for r in dng.current().collect()))
    print("top tokens:",
          [r["token"] for r in vocab.topk(5).collect()])

    # A benchmark lands AFTER ingestion: only overlapping docs re-score.
    eval_docs = spark.createDataFrame(
        [(900, "document is the most original of the fresh novel sources")],
        ["doc_id", "text"],
    )
    changed = cont.add_eval(eval_docs).collect()
    print("retroactively re-scored:",
          [(r["doc_id"], r["contamination"]) for r in changed])
    spark.stop()


if __name__ == "__main__":
    main()
