"""ANN quality gates: sim_ann_ivf / sim_ann_lsh are approximate (no SQL
oracle), so pin their structural contract and recall against the exact
brute-force top-k — the honest check for an ANN operator."""

from __future__ import annotations

import numpy as np
import pytest

from kinesis_handler_spark.queries.llm import _quantized
from kinesis_handler_spark.registry import all_queries
from kinesis_handler_spark.tables import table


@pytest.fixture(scope="module")
def exact_top3(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.q for r in rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    cos = (m @ m.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    pairs = set()
    for i in range(len(ids)):
        for j in np.argsort(-cos[i])[:3]:
            pairs.add((int(ids[i]), int(ids[j])))
    return pairs


def test_ivf_structural_contract(spark, sf_dir):
    rows = all_queries()["sim_ann_ivf"](spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.q_id != r.nbr_id
        assert -1.0 <= r.cosine <= 1.0
        per_q.setdefault(r.q_id, []).append(r.cosine)
    # every vector gets exactly top_k neighbors (dataset >> k)
    assert all(len(v) == 3 for v in per_q.values())


def test_ivf_recall_beats_scan_share(spark, sf_dir, exact_top3):
    # nprobe=2 of 16 cells scans ~12.5% of the corpus; on structureless
    # uniform-random embeddings recall lands ~3x that share (~0.38
    # measured). A regression below 0.25 means assignment/probing broke.
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_ivf"](spark, sf_dir).collect()
    }
    recall = len(got & exact_top3) / len(exact_top3)
    assert recall > 0.25


def test_lsh_candidates_are_exactly_scored(spark, sf_dir):
    # LSH returns top-3 per query WITHIN its bucket — dots must match the
    # exact integer dot product for the returned pairs.
    rows = all_queries()["sim_ann_lsh"](spark, sf_dir).limit(50).collect()
    qv = {
        r.vec_id: np.array(r.q, dtype=np.int64)
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    }
    for r in rows:
        assert r.dot == int(qv[r.id_a] @ qv[r.id_b])
