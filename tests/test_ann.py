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
    # nprobe=5 of K=sqrt(N) cells scans ~5*sqrt(N)/N of the corpus; with
    # symmetric (row+column) candidate emission plus the r7 second
    # Lloyd iteration, measured top-3 recall on structureless
    # uniform-random embeddings is 0.78/0.80/0.62 at sf0.001/0.01/0.1
    # (was 0.42-0.60 forward-only).  A regression below 0.5 means
    # assignment/probing broke.
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_ivf"](spark, sf_dir).collect()
    }
    recall = len(got & exact_top3) / len(exact_top3)
    assert recall > 0.5


def test_ivf_search_tier_recall_is_search_grade(spark, sf_dir, exact_top3):
    # The user-facing tier: nprobe scaled with the index
    # (⌈3.2·√K⌉, _ivf_nprobe — r7 verdict item 1), TWO Lloyd
    # iterations, symmetric candidate emission — measured top-3 recall
    # 0.995 at sf0.001 (nprobe=16), 0.996 at sf0.01, 0.980 at sf0.1
    # (nprobe=22; was 0.957 at the old constant nprobe=18) on the
    # worst-case structureless fixture.  Pin the 0.93 floor; a
    # regression means probing, the nprobe schedule, the Lloyd loop,
    # or the symmetric emission broke.
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_ivf_search"](spark, sf_dir).collect()
    }
    recall = len(got & exact_top3) / len(exact_top3)
    assert recall >= 0.93, f"search-tier recall {recall}"


def test_ivf_nprobe_schedule_shape():
    # The schedule itself: monotone in K, ⌈3.2·√K⌉ in the calibrated
    # range, never exceeds K (probing every cell = exact search), and
    # reproduces the measured operating points from the docstring.
    from kinesis_handler_spark.queries.llm_scale import _ivf_nprobe

    assert _ivf_nprobe(22) == 16   # sf0.001/0.01 → recall 0.995/0.996
    assert _ivf_nprobe(44) == 22   # sf0.1 → recall 0.980
    assert _ivf_nprobe(89) == 31   # sf1.0 → recall 0.957
    assert _ivf_nprobe(4) == 4     # capped at K
    prev = 0
    for k in range(1, 400):
        cur = _ivf_nprobe(k)
        assert cur <= k and cur >= prev
        prev = cur


@pytest.mark.sf1
def test_ivf_search_recall_holds_at_sf1():
    """The r7 verdict's #1 done-criterion: top-3 recall >= 0.93 AT
    sf1.0 on the uniform worst-case corpus (was 0.856 with constant
    nprobe=18; measured 0.957 with the scaled schedule, nprobe=31 of
    K=89 cells).  Runs in the sf1 tier (`pytest -m sf1`) against the
    deterministic tiled sf1.0 replica."""
    from tests.test_sf1_parity import _ensure_sf1

    sf1 = _ensure_sf1()
    spark = __import__(
        "kinesis_handler_spark.session", fromlist=["get_spark"]
    ).get_spark("khs-sf1-ann", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        table(spark, sf1, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.q for r in rows], dtype=np.float64)
    assert len(ids) >= 8000, "sf1.0 embedding corpus unexpectedly small"
    norms = np.sqrt((m * m).sum(axis=1))
    cos = (m @ m.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    exact = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in np.argsort(-cos[i])[:3]
    }
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_ivf_search"](spark, sf1).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.93, f"sf1.0 search-tier recall {recall}"


@pytest.fixture(scope="module")
def exact_dedup_pairs(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.q for r in rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    cos = (m @ m.T) / np.outer(norms, norms)
    pairs = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cos[i, j] >= 0.45:
                a, b = sorted((int(ids[i]), int(ids[j])))
                pairs[(a, b)] = cos[i, j]
    return pairs


def test_dedup_ann_precision_is_exact(spark, sf_dir, exact_dedup_pairs):
    # Every emitted pair must be a TRUE pair with its exact cosine —
    # quantized-integer dot products are exactly representable in
    # float64, so the approximate tier's scores bit-match the exact
    # tier's for the pairs it finds (precision 1.0).
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in all_queries()["dedup_embedding_ann"](spark, sf_dir).collect()
    }
    for pair, cosine in got.items():
        assert pair in exact_dedup_pairs
        assert cosine == pytest.approx(exact_dedup_pairs[pair], abs=1e-15)


def test_dedup_ann_recall_floor(spark, sf_dir, exact_dedup_pairs):
    # IVF-cell candidates at nprobe=4: measured recall 1.0 at sf0.01
    # (deterministic — hashes and data are fixed); floor at 0.85 to
    # allow parameter retuning without masking a real regression.
    got = {
        (r.id_a, r.id_b)
        for r in all_queries()["dedup_embedding_ann"](spark, sf_dir).collect()
    }
    recall = len(got & set(exact_dedup_pairs)) / len(exact_dedup_pairs)
    assert recall >= 0.85


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


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """Deterministic CLUSTER-structured embedding corpus: 40 centers in
    64-dim, 50 points each = 2000 vectors (the sf0.1 embedding count).
    Real embedding corpora are clustered — this is the complementary
    fixture to the structureless uniform one (the worst case for any
    space-partitioning index); recall here shows the index's behavior
    on data shaped like production."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(40, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, 50, axis=0) + 0.15 * rng.normal(size=(2000, 64))
    out = tmp_path_factory.mktemp("clustered_sf")
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]], f"c{i // 50}") for i in range(2000)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label STRING",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def test_ivf_search_recall_on_clustered_corpus(spark, clustered_dir):
    # On clustered data the coarse quantizer aligns with the true
    # structure, so search-tier recall approaches exact: measured
    # 1.000 with seed 7 (0.9985 before the r7 second Lloyd iteration;
    # floor 0.97 leaves retuning margin).  Together with the
    # uniform-fixture floor (>=0.93 worst case) this brackets the
    # operating range a user should expect.
    import numpy as np

    rows = (
        table(spark, clustered_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.q for r in rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    cos = (m @ m.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    exact = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in np.argsort(-cos[i])[:3]
    }
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_ivf_search"](
            spark, clustered_dir
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.97, f"clustered-corpus recall {recall}"


# ---------------------------------------------------------------------------
# Persisted / incremental ANN index (r10 verdict ask #4)
# ---------------------------------------------------------------------------


def test_ann_incremental_recall_vs_exact(spark, sf_dir):
    """Recall floor for the incremental probe: exact brute-force top-3
    of every batch vector against the CORPUS snapshot (the semantic the
    query implements — asymmetric search, queries never answer), vs the
    query's output.  nprobe=⌈3.2·√K⌉ measures ~0.99 at sf0.001/0.01 on
    the uniform fixture; floor 0.93 (the search-tier floor)."""
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.q for r in rows], dtype=np.float64)
    batch = ids % 10 == 7
    qm, qi = m[batch], ids[batch]
    cm, ci = m[~batch], ids[~batch]
    cos = (qm @ cm.T) / np.outer(
        np.sqrt((qm * qm).sum(axis=1)), np.sqrt((cm * cm).sum(axis=1))
    )
    exact = {
        (int(qi[i]), int(ci[j]))
        for i in range(len(qi))
        for j in np.argsort(-cos[i])[:3]
    }
    got = {
        (r.q_id, r.nbr_id)
        for r in all_queries()["sim_ann_incremental"](spark, sf_dir).collect()
    }
    assert all(q % 10 == 7 for q, _ in got)
    assert all(n % 10 != 7 for _, n in got)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.93, f"incremental recall {recall}"


def test_ann_incremental_never_scans_corpus_embeddings(spark, sf_dir):
    """The 100 TB contract: query-time plan reads the embeddings table
    ONLY for the batch slice — the corpus side comes entirely from the
    persisted index parquet (centroid training happened at build time,
    never at query time)."""
    from pyspark.sql import functions as F
    from test_plan_quality import plan_of

    from kinesis_handler_spark.queries.llm import _clean_embeddings

    plan = plan_of(spark, "sim_ann_incremental", sf_dir)
    # corpus vectors contribute ONLY through the index members scan;
    # the batch slice hides behind its lineage-truncation checkpoint
    # (whose own subplan scans embeddings exactly once), and
    # _assign_gemm collects the K centroid rows driver-side (bounded
    # artifact), so no centroid scan either.
    assert plan.count("embeddings.parquet") == 0, plan
    # artifact dirs carry a code fingerprint since r13: ivf_index-<fp>
    assert plan.count("ivf_index") == 1, plan
    assert "/members" in plan, plan

    # the subplan the batch checkpoint materializes (pre-truncate form)
    # scans embeddings exactly once — the pmod batch slice
    batch = _clean_embeddings(spark, sf_dir).filter(
        F.pmod(F.col("vec_id"), F.lit(10)) == 7
    ).select("vec_id", _quantized().alias("qvec"))
    jqe = batch._jdf.queryExecution()
    batch_plan = spark._jvm.PythonSQLUtils.explainString(jqe, "formatted")
    assert batch_plan.count("embeddings.parquet") == 1, batch_plan


def test_append_to_ivf_index_extends_members(spark, sf_dir, tmp_path):
    """Index maintenance: build an index over half the corpus with the
    SAME helpers the fixture build uses, append the other half, and
    verify (a) the member lists now cover both halves, (b) appended
    assignments agree with a from-scratch assignment against the same
    stored centroids (immutability of the quantizer), (c) a probe after
    the append finds neighbors from the appended half."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.queries.llm import _clean_embeddings, _quantized
    from kinesis_handler_spark.queries.llm_scale import (
        _assign_gemm,
        _ivf_cells,
        _train_ivf_centroids,
        append_to_ivf_index,
    )

    qv = _clean_embeddings(spark, sf_dir).select(
        "vec_id", _quantized().alias("qvec")
    )
    half1 = qv.filter(F.pmod("vec_id", F.lit(2)) == 0)
    half2 = qv.filter(F.pmod("vec_id", F.lit(2)) == 1)
    idx = str(tmp_path / "ivf")
    cent = _train_ivf_centroids(half1, _ivf_cells(half1.count()))
    cent.coalesce(1).write.parquet(f"{idx}/centroids")
    cent_back = spark.read.parquet(f"{idx}/centroids")
    (
        _assign_gemm(half1, cent_back, 1)
        .filter(F.col("rank") == 1)
        .select("cell", "vec_id", "qvec")
        .write.parquet(f"{idx}/members")
    )
    n1 = spark.read.parquet(f"{idx}/members").count()
    assert n1 == half1.count()

    append_to_ivf_index(idx, half2)
    members = spark.read.parquet(f"{idx}/members")
    assert members.count() == qv.count()
    # appended rows assign exactly as a fresh assignment would
    fresh = {
        r["vec_id"]: r["cell"]
        for r in _assign_gemm(half2, cent_back, 1)
        .filter(F.col("rank") == 1)
        .select("vec_id", "cell")
        .collect()
    }
    stored = {
        r["vec_id"]: r["cell"]
        for r in members.filter(F.pmod("vec_id", F.lit(2)) == 1)
        .select("vec_id", "cell")
        .collect()
    }
    assert stored == fresh
