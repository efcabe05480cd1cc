"""Streaming incremental dedup (streaming/dedup.py): micro-batches
dedup against the persisted band index, signatures append idempotently,
and the stream's verdicts match the batch incremental operator's
candidate semantics on the same documents."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from kinesis_handler_spark.streaming.dedup import (
    SEED_BATCH_ID,
    dedup_batch,
    dedup_stream,
    init_dedup_index,
    read_verdicts,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "until the watcher gives up entirely"
)
FRESH_B = (
    "fresh content in batch b with no earlier twin anywhere "
    "in the corpus or any batch so far"
)
C_TWIN = (
    "c only text that matches its sibling in this batch "
    "word for word to form a within batch pair"
)
SCHEMA = "doc_id bigint, text string"

CORPUS = [
    (0, BASE),
    (1, "completely different words about spark shuffles here "
        "nothing shared with anything else at all truly"),
    (2, "yet another unrelated document mentioning parquet files "
        "and manifest pointers exclusively for this test"),
]
BATCH_B = [(10, BASE), (11, FRESH_B)]  # 10 dups corpus, 11 is new
BATCH_C = [
    (20, FRESH_B),  # dups the PREVIOUS BATCH -> proves index append
    (21, "totally novel c document with distinct vocabulary spark "
         "streaming exactly once semantics checkpoint replay"),
    (22, C_TWIN),
    (23, C_TWIN),  # within-batch twin of 22 -> 23 flagged (keep-first)
]


def _verdict_map(spark, root):
    return {
        r["doc_id"]: (r["is_dup"], r["dup_of"], r["batch_id"])
        for r in read_verdicts(spark, root).collect()
    }


def test_stream_dedups_across_and_within_batches(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ver = str(tmp_path / "ver")
    src = str(tmp_path / "src")
    os.makedirs(src)
    init_dedup_index(spark.createDataFrame(CORPUS, SCHEMA), idx)

    # two source files with strictly increasing mtimes so
    # maxFilesPerTrigger=1 yields two ORDERED micro-batches
    for i, rows in enumerate((BATCH_B, BATCH_C)):
        p = os.path.join(src, f"batch-{i}.json")
        with open(p, "w") as fh:
            for d, t in rows:
                fh.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        ts = time.time() - 100 + i * 10
        os.utime(p, (ts, ts))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = dedup_stream(stream, idx, ver, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = _verdict_map(spark, ver)
    assert set(got) == {10, 11, 20, 21, 22, 23}
    assert got[10][:2] == (True, 0)      # dup of the seeded corpus
    assert got[11][:2] == (False, None)  # new content sails through
    assert got[20][:2] == (True, 11)     # dup of the APPENDED batch B
    assert got[21][:2] == (False, None)
    assert got[22][:2] == (False, None)  # first twin kept
    assert got[23][:2] == (True, 22)     # later twin flagged
    # batches really ran in order (B before C)
    assert got[10][2] < got[20][2]
    # the index now holds seed + one partition per micro-batch
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(idx).select("batch_id").distinct()
        .collect()
    }
    assert SEED_BATCH_ID in parts and len(parts) == 3


def test_batch_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ver = str(tmp_path / "ver")
    init_dedup_index(spark.createDataFrame(CORPUS, SCHEMA), idx)
    b = spark.createDataFrame(BATCH_B, SCHEMA)

    dedup_batch(b, 0, idx, ver)
    idx_rows = spark.read.parquet(idx).count()
    ver_rows = read_verdicts(spark, ver).collect()

    # at-least-once replay of the SAME batch id: both sinks overwrite
    # exactly their own partition — no duplicate signatures or verdicts
    dedup_batch(b, 0, idx, ver)
    assert spark.read.parquet(idx).count() == idx_rows
    assert sorted(map(tuple, read_verdicts(spark, ver).collect())) == sorted(
        map(tuple, ver_rows)
    )

    # and the next batch still sees exactly one copy of B's signatures:
    # doc 20 dups doc 11 once, with the right partner
    dedup_batch(spark.createDataFrame(BATCH_C, SCHEMA), 1, idx, ver)
    got = _verdict_map(spark, ver)
    assert got[20][:2] == (True, 11)
    n_cand = {
        r["doc_id"]: r["n_candidates"]
        for r in read_verdicts(spark, ver).collect()
    }
    # one partner (doc 11), matched in n_bands buckets but counted per
    # (band,band_sig) candidate row — bounded by 8 bands x 1 partner
    assert 1 <= n_cand[20] <= 8


def test_stream_matches_batch_incremental_semantics(spark, tmp_path):
    """The stream's candidate set over (corpus, B, C) equals the batch
    helper's pairs on the unioned docs, restricted to later-touches-
    earlier pairs — streaming adds ordering, never changes candidates."""
    from kinesis_handler_spark.queries.llm import minhash_band_frame

    idx = str(tmp_path / "idx")
    ver = str(tmp_path / "ver")
    init_dedup_index(spark.createDataFrame(CORPUS, SCHEMA), idx)
    dedup_batch(spark.createDataFrame(BATCH_B, SCHEMA), 0, idx, ver)
    dedup_batch(spark.createDataFrame(BATCH_C, SCHEMA), 1, idx, ver)

    everything = spark.createDataFrame(
        CORPUS + BATCH_B + BATCH_C, SCHEMA
    )
    banded = minhash_band_frame(everything)
    a, b = banded.alias("a"), banded.alias("b")
    full_pairs = {
        (r["hi"], r["lo"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("hi"), F.col("b.doc_id").alias("lo")
        )
        .distinct()
        .collect()
    }
    streamed_docs = {d for d, _ in BATCH_B + BATCH_C}
    expected_dup_of = {}
    for hi in streamed_docs:
        partners = [lo for h, lo in full_pairs if h == hi]
        if partners:
            expected_dup_of[hi] = min(partners)
    got = _verdict_map(spark, ver)
    assert {d for d, v in got.items() if v[0]} == set(expected_dup_of)
    for d, lo in expected_dup_of.items():
        assert got[d][1] == lo, d
