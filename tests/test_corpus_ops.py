"""Third-opinion checks for the corpus-hygiene operators: recompute
each metric in pure Python from the raw fixture and compare against the
declared query's output.  The DuckDB oracle already cross-checks Spark;
these tests add an implementation in a THIRD runtime so a shared
misunderstanding between the two SQL engines can't hide (same strategy
as the sketch tests' pure-python oracles)."""

from __future__ import annotations

import math
import re

import pyarrow.parquet as pq

from kinesis_handler_spark.queries.corpus import _BPE_PATTERN
from kinesis_handler_spark.registry import QUERIES


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_token_bpe_matches_python_re(spark, sf_dir):
    docs = _docs(sf_dir)
    got = {
        r["doc_id"]: (r["n_tok_ws"], r["n_tok_bpe"])
        for r in QUERIES["text_token_bpe"].fn(spark, sf_dir).collect()
    }
    pat = re.compile(_BPE_PATTERN)
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        ws = len(text.split(" "))
        bpe = len(pat.findall(text))
        assert got[doc_id] == (ws, bpe), doc_id


def test_entropy_matches_pure_python(spark, sf_dir):
    docs = _docs(sf_dir)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_bits"])
        for r in QUERIES["text_entropy"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs.items():
        toks = text.split(" ")
        n = len(toks)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        h = -sum((c / n) * math.log2(c / n) for c in counts.values())
        nt, nd, hb = got[doc_id]
        assert (nt, nd) == (n, len(counts)), doc_id
        # query output is 6-dp rounded; allow one grid step of slack for
        # summation-order jitter at the rounding boundary
        assert abs(hb - h) <= 1.000001e-6, (doc_id, hb, h)
    # entropy is bounded by log2(distinct): a structural invariant the
    # value checks above could both get wrong only by violating math
    # (slack = one 6-dp rounding step: the stored value is rounded and
    # may sit just above the exact bound)
    for doc_id, (nt, nd, hb) in got.items():
        assert -1e-6 <= hb <= math.log2(max(nd, 2)) + 1e-6


def test_contamination_ratio_consistency(spark, sf_dir):
    # every row: 0 <= n_matched <= n_shingles, ratio exactly
    # n_matched/n_shingles, and benchmark docs never appear
    rows = QUERIES["contamination_ngram_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 97 != 0
        assert 0 <= r["n_matched"] <= r["n_shingles"]
        assert r["contamination"] == r["n_matched"] / r["n_shingles"]


def test_misra_gries_candidate_superset_guarantee():
    # Pure-pandas adversarial check of the _mg_candidates invariant:
    # with capacity k, every item whose frequency share exceeds
    # 1/(k+1) must survive the per-partition pass — even with a
    # hostile batch order (heavy item spread thin across batches,
    # drowned in a churn of singletons that forces compression).
    import random

    import pandas as pd

    from kinesis_handler_spark.queries.corpus import _mg_candidates

    rng = random.Random(7)
    cap = 16
    # 3 heavy items at ~10% each, 3000 distinct light singletons
    stream = (
        ["hot1"] * 300 + ["hot2"] * 280 + ["hot3"] * 260
        + [f"noise{i}" for i in range(2160)]
    )
    rng.shuffle(stream)
    batches = [
        pd.DataFrame({"tok": stream[i : i + 100]})
        for i in range(0, len(stream), 100)
    ]
    (out,) = list(_mg_candidates(iter(batches), cap=cap))
    cands = set(out["tok"])
    n = len(stream)
    share = 1.0 / (cap + 1)
    for item, cnt in (("hot1", 300), ("hot2", 280), ("hot3", 260)):
        assert cnt / n > share  # test premise
        assert item in cands, item
    assert len(cands) <= cap + 1  # summary stays bounded


def test_web_url_dedup_folds_www_and_merges(spark, sf_dir):
    """Third-opinion check for the URL canonicalizer: replicate the
    seeding + canonicalization in pure-Python ``re`` and compare the
    full group map.  Regression for the r9 advice bug where the
    case-sensitive www-strip ran before lower() and the documented
    www/bare collision class never merged."""
    import re as _re

    docs = sorted(d for d in _docs(sf_dir) if d is not None)
    exp: dict[str, list[int]] = {}
    variants: dict[str, set[str]] = {}
    for d in docs:
        url = "https://"
        if d % 3 == 0:
            url += "WWW."
        url += f"site{d % 13}.example/page/{d % 17}"
        if d % 2 == 0:
            url += "/?utm_source=feed&ref=rss&utm_campaign=x"
        if d % 5 == 0:
            url += f"#section-{d % 7}"
        s = _re.sub(r"#.*$", "", url)
        s = _re.sub(r"([?&])utm_[a-z]+=[^&#]*", r"\1", s)
        s = _re.sub(r"[?&]+$", "", s)
        s = _re.sub(r"\?&", "?", s)
        s = _re.sub(r"/+(\?|$)", r"\1", s)
        host = _re.match(r"^https?://([^/]*)", s).group(1).lower()
        canon = _re.sub(r"^www\.", "", host) + _re.sub(
            r"^https?://[^/]*", "", s
        )
        exp.setdefault(canon, []).append(d)
        variants.setdefault(canon, set()).add(url)
    got = {
        r["canonical_url"]: (r["n_docs"], r["keep_doc"], r["n_variants"])
        for r in QUERIES["web_url_dedup"].fn(spark, sf_dir).collect()
    }
    assert got == {
        c: (len(ids), min(ids), len(variants[c])) for c, ids in exp.items()
    }
    # the operator must demonstrably dedup at test scale: merged groups
    # exist, www/bare variants fold, and no canonical keeps its www
    assert any(n > 1 for n, _, _ in got.values())
    assert any(v > 1 for _, _, v in got.values())
    assert not any(c.startswith("www.") for c in got)
    # at least one merged group mixes a www doc (id%3==0) with a bare one
    assert any(
        len(ids) > 1
        and any(i % 3 == 0 for i in ids)
        and any(i % 3 != 0 for i in ids)
        for ids in exp.values()
    )


def test_length_percentile_filter_keeps_null_lang_group(spark, tmp_path):
    """ADVICE r10 (medium): documents with a NULL lang are a real
    per-language group (the oracle's PARTITION BY keeps them); the
    two-level rank join must be null-safe on lang or every such doc
    silently vanishes from the curation counts.  Build a corpus where
    one lang is NULL and verify the NULL group survives with exact
    trim arithmetic (n=40 -> kept ranks 3..38, rank == n_tokens here)."""
    from pyspark.sql import functions as F

    rows = [
        (lang_i * 100 + k, " ".join(["w"] * k), k, lang, "t")
        for lang_i, lang in enumerate(["aa", None])
        for k in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, n_chars int, lang string, "
        "source string"
    )
    d = str(tmp_path / "sf_nulllang")
    import os

    os.makedirs(d)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {
        r["lang"]: r
        for r in QUERIES["text_length_percentile_filter"]
        .fn(spark, d)
        .collect()
    }
    assert set(got) == {"aa", None}
    for lang in ("aa", None):
        r = got[lang]
        assert r["n_docs"] == 40 and r["n_kept"] == 36, lang
        assert r["kept_min_tokens"] == 3 and r["kept_max_tokens"] == 38
        assert r["kept_tokens"] == sum(range(3, 39))
