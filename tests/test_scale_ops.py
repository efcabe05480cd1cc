"""Scale-mechanics gates for queries/scale_ops.py — the properties the
oracle hash can't see: the Bloom filter actually PRUNES (and never
prunes a true match), the Count-Min estimate is one-sided with the
theoretical error bound, and the Z-order envelope beats a linear sort
on the second dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_handler_spark.queries.scale_ops import (
    _BLOOM_BITS,
    _CMS_W,
    bloom_might_contain,
    build_bloom,
)
from kinesis_handler_spark.tables import table


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """Every true key passes the bitmap (Bloom's hard guarantee), and at
    the fixture's selectivity the bitmap rejects a solid majority of
    non-matching orders before any join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    keys = (
        c.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
        .filter(F.col("c_custkey").isNotNull())
    )
    words = build_bloom(keys, "c_custkey")
    # no false negatives: the key set itself passes 100%
    n_keys = keys.count()
    n_pass_keys = keys.filter(bloom_might_contain(words, "c_custkey")).count()
    assert n_pass_keys == n_keys

    n_orders = o.count()
    n_candidates = o.filter(bloom_might_contain(words, "o_custkey")).count()
    n_true = o.join(
        F.broadcast(keys), o.o_custkey == keys.c_custkey, "left_semi"
    ).count()
    # soundness: candidates ⊇ true matches
    assert n_candidates >= n_true
    # the filter must actually prune: at this selectivity (~11% of
    # customers) a 65536-bit / K=2 bloom keeps fp well under 1%, so
    # candidate share tracks the true share closely.
    assert n_candidates < n_orders * 0.5, (
        f"bloom pruned nothing: {n_candidates}/{n_orders}"
    )
    # false-positive rate among non-matching rows stays under 5%
    # (theory: (1 - e^(-2n/m))^2 ≈ 0.1% at n≈1.5k keys, m=65536)
    fp = n_candidates - n_true
    assert fp <= max(10, 0.05 * (n_orders - n_true)), (
        f"excess false positives: {fp} of {n_orders - n_true} non-matches"
    )


def test_cms_one_sided_and_bounded(spark, sf_dir):
    """CMS estimates are >= exact for the reported heavy tokens, and the
    overcount respects the d-row min bound: overcount <= total/W is the
    per-row EXPECTATION; the min over 4 rows stays within a small
    multiple of it with overwhelming probability — assert 4x."""
    from kinesis_handler_spark.registry import QUERIES

    rows = QUERIES["sketch_count_min"].fn(spark, sf_dir).collect()
    assert rows, "no heavy tokens reported"
    d = table(spark, sf_dir, "documents")
    total = (
        d.select(F.explode(F.split("text", " ")).alias("t")).count()
    )
    for r in rows:
        assert r["overcount"] >= 0, f"{r['tok']}: CMS under-counted"
        assert r["cms_count"] == r["exact_count"] + r["overcount"]
        assert r["overcount"] <= 4 * total / _CMS_W, (
            f"{r['tok']}: overcount {r['overcount']} breaches bound"
        )


def test_zorder_envelope_beats_linear_sort(spark, sf_dir):
    """File envelopes under Z-order bound BOTH dimensions: the mean
    per-file cell span must be far below a linear sort's span (which
    pins x but leaves y covering ~the full 256 domain)."""
    from kinesis_handler_spark.registry import QUERIES

    rows = QUERIES["layout_zorder"].fn(spark, sf_dir).collect()
    assert rows
    # every file's Morton range is 4096 z-values => a 64x64 cell block
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 63
        assert r["max_y"] - r["min_y"] <= 63
        assert r["cell_span"] <= 64 * 64
    # linear sort on x yields per-file y-span ~255 => cell span ~(x_span+1)*256;
    # even its best case (x pinned to one value) is 256 cells — Z-order's
    # 64x64 envelope covers 4096 but bounds BOTH dims at 1/4 domain,
    # which is what two-sided min/max skipping needs.
    spans = [r["max_y"] - r["min_y"] for r in rows]
    assert max(spans) <= 63


def test_bloom_bitmap_is_bounded_artifact():
    """The collected bitmap is fixed-size regardless of corpus scale —
    the bounded-driver-artifact contract."""
    assert _BLOOM_BITS // 64 == 1024


# ---------------------------------------------------------------------------
# LSH bucket-width cap (r9 verdict ask #5)
# ---------------------------------------------------------------------------


def test_bucket_cap_bounds_pairs_and_flags_truncation(spark):
    """A hostile stop-pattern bucket (one band signature shared by 300
    members) must emit at most cap·(cap−1)/2 pairs and be FLAGGED with
    its true width — never silently truncated, never quadratically
    enumerated."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.functions.lsh import cap_band_buckets

    n, cap = 300, 16
    banded = spark.range(n + 5).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        # ids < n share one mega-bucket; the rest are singletons
        F.when(F.col("id") < n, F.lit(11)).otherwise(F.col("id")).alias(
            "band_sig"
        ),
    )
    capped, truncated = cap_band_buckets(
        banded, "doc_id", ("band", "band_sig"), cap=cap
    )
    kept = capped.filter(F.col("band_sig") == 11).collect()
    # deterministic kept set: the cap lowest-ranked members
    assert sorted(r["doc_id"] for r in kept) == list(range(cap))
    # pair emission bound: the capped self-join is quadratic in cap,
    # not in the true bucket width
    a, b = capped.alias("a"), capped.alias("b")
    n_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    assert n_pairs == cap * (cap - 1) // 2  # vs n·(n−1)/2 = 44,850 uncapped
    # truncation is flagged with the true width
    flags = truncated.collect()
    assert len(flags) == 1
    assert (flags[0]["band_sig"], flags[0]["width"], flags[0]["emitted"]) == (
        11, n, cap,
    )
    # singleton buckets are untouched and unflagged
    assert capped.count() == cap + 5


def test_bucket_cap_is_noop_on_clean_corpus(spark, sf_dir):
    """Recall trade-off gate: at test scales NO clean-corpus bucket
    reaches BUCKET_CAP in either banded dedup tier, so the cap costs
    zero recall there (the golden pins prove output-identity; this
    makes the headroom explicit and will flag a corpus change that
    starts eating into it)."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.functions.lineage import truncate
    from kinesis_handler_spark.functions.lsh import BUCKET_CAP
    from kinesis_handler_spark.queries.llm import minhash_band_frame
    from kinesis_handler_spark.tables import table

    mh_widths = (
        minhash_band_frame(table(spark, sf_dir, "documents"))
        .groupBy("band", "band_sig")
        .count()
    )
    assert mh_widths.agg(F.max("count")).collect()[0][0] <= BUCKET_CAP


def test_simhash_bucket_flag_rule_closes_cap_recall(spark, tmp_path):
    """r11 verdict ask #2: the declared ``dedup_simhash`` output must
    implement the measured bucket-flag closing rule — on a corpus where
    the BUCKET_CAP binds, pair rows alone lose uncapped doc-flag
    coverage, and pair rows ∪ ``bucket_flagged`` rows must recover
    100% of the docs the UNCAPPED run would flag (CAP_RECALL_r11.json
    measured 81.1% → 100% at 0.49% over-flag at sf3).

    Hostile fixture: one 200-token boilerplate doc plus 1,500
    two-token-swap variants — a stop-pattern family whose band buckets
    blow past the cap (widths up to ~500) while staying Hamming-close,
    exactly the replication shape the cap exists for."""
    import random

    from kinesis_handler_spark.functions.lsh import cap_band_buckets
    from kinesis_handler_spark.queries.llm_scale import (
        simhash_banded,
        simhash_fingerprints,
        simhash_fpairs,
    )
    from kinesis_handler_spark.registry import all_queries

    rng = random.Random(7)
    base = [f"tok{j}" for j in range(200)]
    rows = [(0, " ".join(base))]
    for v in range(1500):
        toks = list(base)
        for _ in range(2):
            toks[rng.randrange(200)] = f"u{v}_{rng.randrange(9)}"
        rows.append((v + 1, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("tile").alias("source"),
        F.length("text").alias("n_chars"),
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = all_queries()["dedup_simhash"](spark, sf_dir).cache()
    pair_rows = out.filter(~F.col("bucket_flagged"))
    flag_rows = out.filter(F.col("bucket_flagged"))

    # flag rows are doc-level: NULL pair fields, real doc ids
    assert flag_rows.filter(
        F.col("doc_b").isNotNull() | F.col("hamming").isNotNull()
    ).count() == 0
    assert flag_rows.count() > 0  # the cap binds on this corpus

    # ground truth: docs the UNCAPPED pair run would flag (cross-group;
    # within-group Hamming-0 flags are cap-independent so excluded from
    # both sides, mirroring tools/cap_recall_probe.py)
    fp = simhash_fingerprints(table(spark, sf_dir, "documents")).cache()
    banded = simhash_banded(fp.select("simhash").distinct())
    unc = simhash_fpairs(banded)
    uflag_docs = fp.join(
        unc.select(F.col("fa").alias("simhash"))
        .unionAll(unc.select(F.col("fb").alias("simhash")))
        .distinct(),
        "simhash",
        "left_semi",
    ).select("doc_id")

    pair_docs = (
        pair_rows.filter(F.col("hamming") > 0)  # cross-group only
        .select(F.col("doc_a").alias("doc_id"))
        .unionAll(pair_rows.filter(F.col("hamming") > 0).select(
            F.col("doc_b").alias("doc_id")
        ))
        .distinct()
    )
    missed_by_pairs = uflag_docs.join(pair_docs, "doc_id", "left_anti").count()
    assert missed_by_pairs > 0, (
        "fixture no longer makes the cap bind — pairs alone recover "
        "every uncapped flag, so the closing rule is untested"
    )

    # THE GATE: pair docs ∪ bucket-flagged docs ⊇ uncapped-flagged docs
    rule_docs = pair_docs.unionAll(
        flag_rows.select(F.col("doc_a").alias("doc_id"))
    ).distinct()
    uncovered = uflag_docs.join(rule_docs, "doc_id", "left_anti").count()
    assert uncovered == 0, (
        f"{uncovered} uncapped-flagged docs not covered by the "
        "pair ∪ bucket-flag rule (coverage must be 1.0)"
    )
    # and a sanity cap on the over-flag cost: the rule may flag extra
    # truncated-bucket members, but not an unbounded fraction
    n_uflag = uflag_docs.count()
    assert rule_docs.count() <= n_uflag * 1.05
    out.unpersist()
    fp.unpersist()


def test_minhash_bucket_flag_rule_closes_cap_recall(spark, tmp_path):
    """Same closing-rule gate for `dedup_near_minhash` (the verdict
    named both capped generators): 80 byte-identical boilerplate docs
    share every band bucket (width 80 > BUCKET_CAP=64), so capped
    pairs alone flag only the 64 kept members — the bucket-flag tier
    must cover the 16 dropped ones, restoring 100% of the uncapped
    doc-flag set."""
    from kinesis_handler_spark.functions.lsh import BUCKET_CAP
    from kinesis_handler_spark.registry import all_queries

    txt = ("replicated navigation footer boilerplate appearing on every "
           "page of the crawl with enough words to shingle properly")
    n_dup = BUCKET_CAP + 16
    rows = [(i, txt, "en", "tile", len(txt)) for i in range(n_dup)]
    rows += [
        (1000 + i, f"unique document {i} about topic {i} with distinct "
                   f"content entirely its own and unshared {i}",
         "en", "tile", 90)
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = all_queries()["dedup_near_minhash"](spark, sf_dir).collect()
    pair_docs = {
        d
        for r in out
        if not r["bucket_flagged"]
        for d in (r["doc_a"], r["doc_b"])
    }
    flag_docs = {r["doc_a"] for r in out if r["bucket_flagged"]}
    dup_ids = set(range(n_dup))
    # uncapped banding would flag every identical doc; capped pairs
    # alone must NOT (else the fixture stopped binding)
    assert not dup_ids <= pair_docs
    assert len(pair_docs & dup_ids) == BUCKET_CAP
    # the gate: pairs ∪ flags == the uncapped flag set, flags are
    # exactly the truncated-bucket membership
    assert (pair_docs | flag_docs) >= dup_ids
    assert flag_docs == dup_ids
    # flag rows are doc-level (NULL partner)
    assert all(
        r["doc_b"] is None for r in out if r["bucket_flagged"]
    )
