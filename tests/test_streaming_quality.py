"""Streaming quality gate (streaming/quality.py): micro-batches score
against the PERSISTED NB model, low scores route to quarantine,
streaming scores bit-equal the batch query's scores on the same docs,
and replays are idempotent."""

from __future__ import annotations

import json
import os
import time

from kinesis_handler_spark.registry import all_queries
from kinesis_handler_spark.streaming.quality import (
    quality_stream,
    read_quarantine,
    score_batch,
    train_quality_model,
)
from kinesis_handler_spark.tables import table

SCHEMA = "doc_id bigint, text string"


def test_streaming_scores_bit_equal_batch(spark, sf_dir, tmp_path):
    """The persisted-model score of every corpus doc equals the batch
    text_quality_classifier's score_fp BIT FOR BIT — the fixed-point
    contract makes the equality exact, not approximate (the model is
    trained once on the corpus; the stream consumes the artifact)."""
    model = str(tmp_path / "model")
    acc, quar = str(tmp_path / "acc"), str(tmp_path / "quar")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    train_quality_model(docs, model)

    # score the whole corpus as one "micro-batch" through the stream body
    score_batch(docs, 0, model, acc, quar)
    got = {
        r["doc_id"]: r["score_fp"]
        for root in (acc, quar)
        for r in spark.read.parquet(root).collect()
    }
    want = {
        r["doc_id"]: r["score_fp"]
        for r in all_queries()["text_quality_classifier"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_quarantine_routing_and_replay_idempotence(spark, sf_dir, tmp_path):
    model = str(tmp_path / "model")
    acc, quar = str(tmp_path / "acc"), str(tmp_path / "quar")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    train_quality_model(docs, model)
    batch = docs.limit(200)

    score_batch(batch, 0, model, acc, quar)
    a1 = sorted(map(tuple, spark.read.parquet(acc).collect()))
    q1 = sorted(map(tuple, spark.read.parquet(quar).collect()))
    # the gate splits: every accepted score > 0, every quarantined <= 0,
    # and both sides are non-empty on the real corpus
    assert a1 and q1
    assert all(r[1] > 0 for r in a1)
    assert all(r[1] <= 0 for r in q1)

    # at-least-once replay of the SAME batch id: both sinks overwrite
    # exactly their own partition
    score_batch(batch, 0, model, acc, quar)
    assert sorted(map(tuple, spark.read.parquet(acc).collect())) == a1
    assert sorted(map(tuple, spark.read.parquet(quar).collect())) == q1


def test_quality_stream_end_to_end(spark, sf_dir, tmp_path):
    """Drive the gate through a real file-source stream: two ordered
    micro-batches, verdicts land per batch, quarantine holds exactly
    the low scorers."""
    model = str(tmp_path / "model")
    acc, quar = str(tmp_path / "acc"), str(tmp_path / "quar")
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    train_quality_model(docs, model)

    rows = [
        (r["doc_id"], r["text"])
        for r in docs.filter("doc_id IS NOT NULL AND text IS NOT NULL")
        .limit(40)
        .collect()
    ]
    for i, chunk in enumerate((rows[:20], rows[20:])):
        p = os.path.join(src, f"batch-{i}.json")
        with open(p, "w") as fh:
            for d, t in chunk:
                fh.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        ts = time.time() - 100 + i * 10
        os.utime(p, (ts, ts))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = quality_stream(stream, model, acc, quar, str(tmp_path / "ck"))
    q.awaitTermination(120)

    batch_scores = {
        r["doc_id"]: r["score_fp"]
        for r in all_queries()["text_quality_classifier"](
            spark, sf_dir
        ).collect()
    }
    acc_ids = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    quar_ids = {
        r["doc_id"] for r in read_quarantine(spark, quar).collect()
    }
    sent = {d for d, _ in rows}
    assert acc_ids | quar_ids == sent
    assert acc_ids == {d for d in sent if batch_scores[d] > 0}
    assert quar_ids == {d for d in sent if batch_scores[d] <= 0}
    # both micro-batches produced output partitions
    bids = {
        r["batch_id"]
        for root in (acc, quar)
        for r in spark.read.parquet(root).select("batch_id").collect()
    }
    assert bids == {0, 1}
