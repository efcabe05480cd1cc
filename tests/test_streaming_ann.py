"""Streaming incremental ANN (streaming/ann.py): micro-batches search
the persisted IVF index, each batch's vectors become searchable for
later batches (frozen-quantizer add), returned cosines are exact, and
replays are idempotent."""

from __future__ import annotations

import json
import math
import os
import time

from kinesis_handler_spark.streaming.ann import (
    SEED_BATCH_ID,
    ann_batch,
    ann_stream,
    init_ann_index,
    read_neighbors,
)

SCHEMA = "vec_id bigint, qvec array<bigint>"
DIM = 8


def _vec(axis: int, bump: int = 0) -> list[int]:
    v = [0] * DIM
    v[axis] = 1000
    v[(axis + 1) % DIM] = bump
    return v


#: Seed corpus: 10 vectors per axis-cluster on axes 0/1/2, small
#: deterministic bumps so vectors are distinct but tightly clustered.
CORPUS = [
    (10 * a + i, _vec(a, i)) for a in range(3) for i in range(10)
]
DIAG = [500, 500, 0, 0, 0, 0, 0, 0]  # a direction absent from the seed
BATCH_B = [
    (100, _vec(0, 3)),   # near cluster 0
    (101, DIAG),         # novel diagonal direction
]
BATCH_C = [
    (200, DIAG),         # same direction as 101 -> must match BATCH B
    (201, _vec(2, 4)),   # near cluster 2
]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def test_stream_searches_and_adds_across_batches(spark, tmp_path):
    idx = str(tmp_path / "idx")
    nbr = str(tmp_path / "nbr")
    src = str(tmp_path / "src")
    os.makedirs(src)
    init_ann_index(spark.createDataFrame(CORPUS, SCHEMA), idx)

    for i, rows in enumerate((BATCH_B, BATCH_C)):
        p = os.path.join(src, f"batch-{i}.json")
        with open(p, "w") as fh:
            for vid, q in rows:
                fh.write(json.dumps({"vec_id": vid, "qvec": q}) + "\n")
        ts = time.time() - 100 + i * 10
        os.utime(p, (ts, ts))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = ann_stream(stream, idx, nbr, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {}
    for r in read_neighbors(spark, nbr).collect():
        got.setdefault(r["q_id"], []).append(
            (r["nbr_id"], r["cosine"], r["batch_id"])
        )
    assert set(got) == {100, 101, 200, 201}
    vecs = dict(CORPUS + BATCH_B + BATCH_C)
    for qid, hits in got.items():
        assert len(hits) == 3
        for nbr_id, cosine, bid in hits:
            # neighbors come only from STRICTLY EARLIER arrivals
            assert nbr_id in vecs and nbr_id != qid
            if bid == 0:
                assert nbr_id < 100  # batch B sees only the seed
            # returned cosine is the exact value (quantized-integer
            # dot products are exactly representable in float64)
            assert abs(cosine - _cos(vecs[qid], vecs[nbr_id])) < 1e-12
    # nearest-cluster sanity on the seed
    assert got[100][0][0] // 10 == 0   # top hit in cluster 0
    assert got[201][0][0] // 10 == 2   # top hit in cluster 2
    # cross-batch add: 200's diagonal matches 101 (cosine 1.0), which
    # exists only because batch B's vectors were added to the index
    assert got[200][0][0] == 101
    assert abs(got[200][0][1] - 1.0) < 1e-12
    # index holds seed + one partition per micro-batch
    parts = {
        r["batch_id"]
        for r in spark.read.parquet(f"{idx}/members")
        .select("batch_id").distinct().collect()
    }
    assert SEED_BATCH_ID in parts and len(parts) == 3


def test_ann_batch_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    nbr = str(tmp_path / "nbr")
    init_ann_index(spark.createDataFrame(CORPUS, SCHEMA), idx)
    b = spark.createDataFrame(BATCH_B, SCHEMA)

    ann_batch(b, 0, idx, nbr)
    n_members = spark.read.parquet(f"{idx}/members").count()
    hits = sorted(map(tuple, read_neighbors(spark, nbr).collect()))

    # at-least-once replay of the SAME batch id: both sinks overwrite
    # exactly their own partition — no duplicate members or neighbors,
    # and the replayed queries never match their own first attempt
    ann_batch(b, 0, idx, nbr)
    assert spark.read.parquet(f"{idx}/members").count() == n_members
    assert sorted(map(tuple, read_neighbors(spark, nbr).collect())) == hits

    # the next batch sees exactly one copy of B's vectors
    ann_batch(spark.createDataFrame(BATCH_C, SCHEMA), 1, idx, nbr)
    got200 = sorted(
        (
            (r["nbr_id"], r["cosine"])
            for r in read_neighbors(spark, nbr)
            .filter("q_id = 200").collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert got200[0][0] == 101 and abs(got200[0][1] - 1.0) < 1e-12


def test_compact_folds_batches_and_preserves_search(spark, tmp_path):
    """compact_ann_index folds committed batch partitions into the seed
    partition without changing ANY future search result: rows are copied
    verbatim (frozen quantizer) and batch_id=-1 still satisfies the
    strictly-earlier visibility predicate for every later batch."""
    import shutil

    from kinesis_handler_spark.streaming.ann import compact_ann_index

    idx = str(tmp_path / "idx")
    nbr = str(tmp_path / "nbr")
    init_ann_index(spark.createDataFrame(CORPUS, SCHEMA), idx)
    ann_batch(spark.createDataFrame(BATCH_B, SCHEMA), 0, idx, nbr)
    ann_batch(spark.createDataFrame(BATCH_C, SCHEMA), 1, idx, nbr)

    # uncompacted twin for the equivalence check
    idx2 = str(tmp_path / "idx2")
    nbr2 = str(tmp_path / "nbr2")
    shutil.copytree(idx, idx2)

    before = sorted(
        map(tuple, spark.read.parquet(f"{idx}/members").collect())
    )
    compact_ann_index(spark, idx, upto_batch_id=1)

    # one physical partition left; rows identical except the fold
    dirs = sorted(
        d for d in os.listdir(f"{idx}/members") if d.startswith("batch_id=")
    )
    assert dirs == [f"batch_id={SEED_BATCH_ID}"]
    after = sorted(
        map(tuple, spark.read.parquet(f"{idx}/members").collect())
    )
    assert [r[:-1] for r in after] == [r[:-1] for r in before]
    assert all(r[-1] == SEED_BATCH_ID for r in after)

    # a post-compaction batch returns bit-identical neighbors
    batch_d = [(300, _vec(1, 5)), (301, DIAG)]
    ann_batch(spark.createDataFrame(batch_d, SCHEMA), 2, idx, nbr)
    ann_batch(spark.createDataFrame(batch_d, SCHEMA), 2, idx2, nbr2)
    got = sorted(
        map(tuple, read_neighbors(spark, nbr).filter("batch_id = 2").collect())
    )
    want = sorted(
        map(tuple, read_neighbors(spark, nbr2).filter("batch_id = 2").collect())
    )
    assert got == want and len(got) > 0
