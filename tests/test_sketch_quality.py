"""Second-invariant gates for the rows-only sketch/signature queries
(VERDICT r1 "harden rows-only queries"): each approximate operator gets
an INDEPENDENT oracle — pure-Python recomputation where the algorithm is
deterministic (simhash, fingerprint), set-containment against the exact
operator where it is probabilistic (minhash), and error/recall floors
for the sketches (HLL, LSH).

The only Spark-derived input the Python oracles reuse is the per-token
``xxhash64`` value (engine-specific hash, fetched once via a trivial
expression); every fold/majority/banding step is re-executed in Python,
so a bug in the higher-order-function pipelines cannot self-verify.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_handler_spark.queries.llm import _quantized
from kinesis_handler_spark.registry import all_queries
from kinesis_handler_spark.tables import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir) -> dict[int, str]:
    return {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


@pytest.fixture(scope="module")
def token_hashes(spark, docs) -> dict[str, int]:
    """Spark's xxhash64 per distinct token — the ONE engine-specific
    input the Python oracles below consume."""
    toks = sorted({t for txt in docs.values() for t in txt.split(" ")})
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    return {r.tok: r.h for r in df.select("tok", F.xxhash64("tok").alias("h")).collect()}


def _shingles(txt: str) -> set[str]:
    t = txt.split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_minhash_candidates_cover_high_jaccard_pairs(spark, sf_dir, docs):
    # LSH banding (8 bands x 4 rows) detects a pair with probability
    # 1-(1-j^4)^8 — >0.9998 at j>=0.9 and >0.97 at j>=0.7.  The fixture
    # dups all sit at j>=0.9, so the candidate set must contain EVERY
    # exact-jaccard pair at j>=0.5 (deterministic hashes: this is a hard
    # invariant on this data, not a statistical one).
    sh = {d: _shingles(t) for d, t in docs.items() if len(t.split(" ")) >= 3}
    ids = sorted(sh)
    high = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                high.add((a, b))
    assert high, "fixture should contain planted near-duplicates"
    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dedup_near_minhash"](spark, sf_dir).collect()
    }
    assert high <= got, f"missed true pairs: {sorted(high - got)[:5]}"


def test_simhash_matches_pure_python_oracle(spark, sf_dir, docs, token_hashes):
    # Full independent recomputation: majority-bit fingerprints, 16-bit
    # banding, Hamming<=6 — the Spark HOF pipeline must agree EXACTLY.
    def simhash(txt: str) -> int:
        hs = [token_hashes[t] for t in set(txt.split(" "))]
        fp = 0
        for bit in range(64):
            if sum((h >> bit) & 1 for h in hs) * 2 > len(hs):
                fp |= 1 << bit
        return fp

    fps = {d: simhash(t) for d, t in docs.items()}

    def bands(fp: int) -> list[int]:
        return [(fp >> (16 * b)) & 0xFFFF for b in range(4)]

    expected = set()
    idl = sorted(fps)
    for i, a in enumerate(idl):
        for b in idl[i + 1 :]:
            if any(x == y for x, y in zip(bands(fps[a]), bands(fps[b]))):
                ham = bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
                if ham <= 6:
                    expected.add((a, b, ham))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in all_queries()["dedup_simhash"](spark, sf_dir).collect()
    }
    assert got == expected


def test_fingerprint_matches_pure_python_fold(spark, sf_dir, docs, token_hashes):
    # The rolling hash h = (h*31 + xxhash64(tok) mod p) mod p re-folded
    # in Python must equal the Spark aggregate() fold for every doc —
    # and reversing the tokens must change it (order sensitivity).
    p = 2147483647

    def fold(tokens: list[str]) -> int:
        acc = 0
        for t in tokens:
            acc = (acc * 31 + (token_hashes[t] % p)) % p
        return acc

    got = {
        r.doc_id: r.fingerprint
        for r in all_queries()["text_fingerprint"](spark, sf_dir).collect()
    }
    changed = 0
    for d, txt in docs.items():
        toks = txt.split(" ")
        assert got[d] == fold(toks), f"doc {d} fingerprint mismatch"
        if len(set(toks)) > 1 and fold(toks) != fold(toks[::-1]):
            changed += 1
    assert changed > len(docs) * 0.9  # order-sensitive by design


def test_approx_distinct_within_sketch_error(spark, sf_dir):
    # HLL++ at rsd=0.02: allow 10x the configured rsd as a hard bound
    # (measured max relative error 0.0085 at sf0.01).
    qs = all_queries()
    exact = {
        r.o_orderpriority: r.n_customers
        for r in qs["agg_count_distinct"](spark, sf_dir).collect()
    }
    for r in qs["agg_approx_distinct"](spark, sf_dir).collect():
        rel = abs(r.approx_customers - exact[r.o_orderpriority]) / exact[
            r.o_orderpriority
        ]
        assert rel <= 0.1


def test_lsh_recall_floor_and_candidate_quality(spark, sf_dir):
    # Multi-table LSH on structureless gaussian embeddings is the
    # worst case (true neighbors sit near the ambient cosine noise
    # floor).  With L=12 tables at r=log2(N)-3 bits, measured top-3
    # recall is ~0.45 at sf0.001 / ~0.5 at sf0.01 / ~0.36 at sf0.1
    # (the r=log2(N)+1 single-probe design this replaced measured
    # 0.02-0.12).  Pin (a) a regression floor at roughly half the
    # measured value and (b) that returned pairs are far better than
    # random: their mean cosine must exceed the corpus mean by a wide
    # margin.
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
    top3 = set()
    for i in range(len(ids)):
        for j in np.argsort(-cos[i])[:3]:
            a, b = sorted((int(ids[i]), int(ids[j])))
            top3.add((a, b))
    idx = {int(v): k for k, v in enumerate(ids)}
    got = {
        (r.id_a, r.id_b)
        for r in all_queries()["sim_ann_lsh"](spark, sf_dir).collect()
    }
    recall = len(got & top3) / len(top3)
    assert recall >= 0.25, f"recall {recall}"
    # Random SIGNED cosine averages ~0; |cosine| averages ~0.10 on this
    # corpus.  Returned pairs average ~0.15 (measured) — require they
    # clearly beat the absolute-value noise floor.
    pair_cos = np.array([cos[idx[a], idx[b]] for a, b in got])
    baseline = np.abs(cos[np.isfinite(cos)]).mean()
    assert pair_cos.mean() > 1.2 * baseline


def test_rolling_distinct_hll_tracks_exact(spark, sf_dir):
    # the HLL tier must agree with the exact day-explode tier within
    # sketch error on every day the exact tier reports (lgConfigK=12
    # => ~1.6% RSE; allow 5% plus a +/-2 absolute floor for tiny days).
    from kinesis_handler_spark.registry import all_queries

    exact = {
        r["day"]: r["users_7d"]
        for r in all_queries()["events_rolling_distinct"](
            spark, sf_dir
        ).collect()
    }
    est = {
        r["day"]: r["users_7d_est"]
        for r in all_queries()["events_rolling_distinct_hll"](
            spark, sf_dir
        ).collect()
    }
    # the sketch tier reports only days with events; every such day must
    # exist in the exact tier (which also covers trailing empty days)
    assert set(est) <= set(exact) and est
    for day, e in est.items():
        x = exact[day]
        assert abs(e - x) <= max(2, 0.05 * x), (day, e, x)


def test_rolling_distinct_hll_survives_day_gaps(spark, sf_dir):
    # review finding (round 5): a ROWS frame over existing days widens
    # silently when a calendar day has zero events; the RANGE frame
    # must keep the trailing window at exactly day-6..day.  Simulate a
    # gap by dropping one mid-month day, then compare tiers.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kinesis_handler_spark.tables import table

    ev = (
        table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .filter(F.dayofmonth("day") != 15)
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = Window.orderBy(F.unix_date("day")).rangeBetween(-6, 0)
    est = {
        r["day"]: r["e"]
        for r in daily.select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
            .cast("bigint")
            .alias("e"),
        ).collect()
    }
    exact = {
        r["day"]: r["x"]
        for r in ev.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("x"))
        .collect()
    }
    assert est
    for day, e in est.items():
        x = exact[day]
        assert abs(e - x) <= max(2, 0.05 * x), (day, e, x)


@pytest.mark.sf1
def test_approx_percentile_bound_holds_at_sf1(spark):
    """r7 verdict item 8: the GK-sketch error bound, previously pytest-
    pinned only at small SF, re-checked at sf1.0 (1.5M orders) so the
    100 TB percentile path has scale evidence.  Groups are ~300k rows
    here — the regime where a sketch with accuracy=10000 must actually
    compress (at sf0.01 the sketch holds every row exactly)."""
    from tests.test_sf1_parity import _ensure_sf1

    sf1 = _ensure_sf1()
    qs = all_queries()
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["lo"], r["hi"])
        for r in qs["agg_percentiles"](spark, sf1).collect()
    }
    approx = qs["agg_approx_percentile"](spark, sf1).collect()
    assert len(approx) == len(exact) > 0
    for r in approx:
        p50, p90, lo, hi = exact[r["o_orderpriority"]]
        assert lo <= r["p50_approx"] <= hi
        assert lo <= r["p90_approx"] <= hi
        # GK guarantees rank error <= n/accuracy; with accuracy=10000
        # and ~300k-row groups that is ~30 ranks — far tighter than the
        # 5%-of-range envelope also used at small SF.  Keep the same
        # envelope so the gate is scale-invariant and regression-proof.
        assert abs(r["p50_approx"] - p50) <= 0.05 * (hi - lo)
        assert abs(r["p90_approx"] - p90) <= 0.05 * (hi - lo)
