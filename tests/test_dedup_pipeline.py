"""dedup_pipeline_scale — the composed 100 TB dedup query (MinHash-LSH
candidates → large-star/small-star components → keep-min verdict).
Rows-only for the driver (engine hashing), so these gates ARE its
correctness check."""

from __future__ import annotations

from kinesis_handler_spark.registry import all_queries


def _pipeline(spark, sf_dir):
    return {
        r["doc_id"]: (r["component_id"], r["n_members"], r["keep"])
        for r in all_queries()["dedup_pipeline_scale"](spark, sf_dir).collect()
    }


def test_total_partition_and_keep_consistency(spark, sf_dir):
    out = _pipeline(spark, sf_dir)
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    # every document appears exactly once, singletons included
    assert set(out) == docs
    # component ids are the member minimum; exactly one keep per component
    by_comp: dict[int, list[int]] = {}
    for doc, (cid, _n, _k) in out.items():
        by_comp.setdefault(cid, []).append(doc)
    for cid, members in by_comp.items():
        assert cid == min(members)
        keeps = [d for d in members if out[d][2]]
        assert keeps == [cid]
        # n_members annotation matches the actual component size
        assert all(out[d][1] == len(members) for d in members)


def test_high_jaccard_dups_share_component(spark, sf_dir):
    # LSH banding (8x4) catches j>=0.9 pairs with p > 0.9998 and the
    # hashes are deterministic, so every exact-tier pair at j>=0.9 (the
    # planted-duplicate band) must land in one pipeline component.  The
    # gate is deliberately NOT set at j>=0.5: per-band match probability
    # at j=0.5 is 0.5^4, overall ~0.4 — missing such a pair is expected
    # LSH behavior, not a pipeline bug.
    from kinesis_handler_spark.queries.llm import _jaccard_pair_frame

    out = _pipeline(spark, sf_dir)
    exact = _jaccard_pair_frame(spark, sf_dir).collect()
    high = [
        (r["doc_a"], r["doc_b"])
        for r in exact
        if 10 * r["n_common"] >= 9 * r["n_union"]  # jaccard >= 0.9
    ]
    assert high, "fixture should contain planted near-duplicates"
    for a, b in high:
        assert out[a][0] == out[b][0], f"dup pair ({a},{b}) split"


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) MinHash dedup — r9 verdict ask #3
# ---------------------------------------------------------------------------


def test_incremental_minhash_equals_full_rerun(spark, sf_dir):
    """The incremental run (new batch probed against the persisted
    corpus band index + within-batch self-join) must produce EXACTLY
    the full-rerun MinHash pairs on the unioned corpus restricted to
    pairs touching the batch — the correctness contract that lets a
    production crawl never re-scan its corpus."""
    from pyspark.sql import functions as F

    full = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["dedup_near_minhash"](spark, sf_dir).collect()
    }
    batch = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(
            F.col("doc_id").isNotNull()
            & (F.pmod(F.col("doc_id"), F.lit(10)) == 7)
        )
        .collect()
    }
    expected = {p for p in full if p[0] in batch or p[1] in batch}
    got_rows = all_queries()["dedup_incremental_minhash"](
        spark, sf_dir
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == expected
    # the against label tells the consumer which snapshot the partner
    # came from; both endpoints in batch <=> 'batch'
    for r in got_rows:
        both = r["doc_a"] in batch and r["doc_b"] in batch
        assert r["against"] == ("batch" if both else "corpus"), r
    # the restriction must not be vacuous: the corpus has planted
    # duplicate bands, so some pairs span the split at every sf
    assert expected, "no batch-touching pairs — fixture split broken"


def test_incremental_minhash_never_rescans_corpus(spark, sf_dir):
    """Plan gate: the query-time plan reads the persisted band index
    (once) and NEVER documents.parquet — the batch slice is the only
    text read, and it hides behind the lineage-truncation checkpoint
    whose own subplan scans documents exactly once."""
    from test_plan_quality import plan_of

    from kinesis_handler_spark.queries.llm import (
        _batch_slice,
        minhash_band_frame,
    )

    plan = plan_of(spark, "dedup_incremental_minhash", sf_dir)
    # corpus text contributes ONLY through the index parquet; the one
    # index read feeds the probe join (the within-batch side reuses the
    # truncated probe, not the index)
    assert plan.count("documents.parquet") == 0, plan
    assert plan.count("minhash_band_index") == 1, plan

    # the probe subplan (what the truncation checkpoint materializes)
    # scans documents exactly once — the batch slice
    probe = minhash_band_frame(_batch_slice(spark, sf_dir))
    jqe = probe._jdf.queryExecution()
    probe_plan = spark._jvm.PythonSQLUtils.explainString(jqe, "formatted")
    assert probe_plan.count("documents.parquet") == 1, probe_plan


def test_incremental_minhash_multi_batch_append(spark, tmp_path):
    """The production chain: dedup batch B against index(A), APPEND B's
    signatures, dedup batch C against index(A ∪ B) — each step touches
    only the new batch's text, and the chained result equals the full
    rerun restricted to C-touching pairs."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.queries.llm import (
        append_to_minhash_index,
        minhash_band_frame,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "until the watcher gives up entirely"
    )

    def mk(doc_id, text):
        return (doc_id, text)

    # A: corpus of 6 docs, two sharing near-identical text
    rows_a = [
        mk(0, base),
        mk(1, base + " tail zero"),
        mk(2, "completely different words about spark shuffles here "
              "nothing shared with anything else at all truly"),
        mk(3, "yet another unrelated document mentioning parquet files "
              "and manifest pointers exclusively for this test"),
        mk(4, base + " tail zero"),
        mk(5, "short one two three four five six seven eight nine ten"),
    ]
    # B: one dup of A's base text, one fresh
    rows_b = [
        mk(10, base),
        mk(11, "fresh content in batch b with no earlier twin anywhere "
               "in the corpus or any batch so far"),
    ]
    # C: dups of A (base) AND of B (fresh content), plus within-C twins
    rows_c = [
        mk(20, base + " tail zero"),
        mk(21, "fresh content in batch b with no earlier twin anywhere "
               "in the corpus or any batch so far"),
        mk(22, "c only text that matches its sibling in this batch "
               "word for word to form a within batch pair"),
        mk(23, "c only text that matches its sibling in this batch "
               "word for word to form a within batch pair"),
    ]
    schema = "doc_id bigint, text string"
    df_a = spark.createDataFrame(rows_a, schema)
    df_b = spark.createDataFrame(rows_b, schema)
    df_c = spark.createDataFrame(rows_c, schema)

    idx_path = str(tmp_path / "idx")
    minhash_band_frame(df_a).write.parquet(idx_path)

    def probe(batch_df):
        idx = spark.read.parquet(idx_path).select(
            F.col("doc_id").alias("corpus_doc"), "band", "band_sig"
        )
        pr = minhash_band_frame(batch_df)
        vs = (
            pr.join(idx, ["band", "band_sig"])
            .select(
                F.least("doc_id", "corpus_doc").alias("doc_a"),
                F.greatest("doc_id", "corpus_doc").alias("doc_b"),
            )
            .distinct()
        )
        x, y = pr.alias("x"), pr.alias("y")
        within = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_sig") == F.col("y.band_sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        return {
            (r["doc_a"], r["doc_b"])
            for r in vs.unionByName(within).collect()
        }

    def full_pairs(df):
        banded = minhash_band_frame(df)
        a, b = banded.alias("a"), banded.alias("b")
        return {
            (r["doc_a"], r["doc_b"])
            for r in a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        }

    got_b = probe(df_b)
    full_ab = full_pairs(df_a.unionByName(df_b))
    b_ids = {10, 11}
    assert got_b == {p for p in full_ab if p[0] in b_ids or p[1] in b_ids}
    assert (0, 10) in got_b  # the planted A-dup was caught

    append_to_minhash_index(idx_path, df_b)

    got_c = probe(df_c)
    full_abc = full_pairs(df_a.unionByName(df_b).unionByName(df_c))
    c_ids = {20, 21, 22, 23}
    assert got_c == {p for p in full_abc if p[0] in c_ids or p[1] in c_ids}
    assert (11, 21) in got_c  # dup against the APPENDED batch B
    assert (22, 23) in got_c  # within-batch twin


def test_keep_best_quality_selects_cluster_max(spark, sf_dir):
    """dedup_keep_best_quality: exactly one keeper per cluster, the
    keeper's score is the cluster max (doc_id tie-break), clusters and
    membership identical to dedup_pipeline_scale, scores identical to
    text_quality_classifier."""
    rows = all_queries()["dedup_keep_best_quality"](spark, sf_dir).collect()
    base = {
        r["doc_id"]: (r["component_id"], r["n_members"])
        for r in all_queries()["dedup_pipeline_scale"](spark, sf_dir).collect()
    }
    scores = {
        r["doc_id"]: r["score_fp"]
        for r in all_queries()["text_quality_classifier"](
            spark, sf_dir
        ).collect()
    }
    assert {r["doc_id"] for r in rows} == set(base)
    by_comp: dict[int, list] = {}
    for r in rows:
        assert (r["component_id"], r["n_members"]) == base[r["doc_id"]]
        if r["doc_id"] in scores:
            assert r["score_fp"] == scores[r["doc_id"]]
        by_comp.setdefault(r["component_id"], []).append(r)
    for cid, ms in by_comp.items():
        keeps = [m for m in ms if m["keep"]]
        assert len(keeps) == 1, cid
        k = keeps[0]
        mx = max(m["score_fp"] for m in ms)
        assert k["score_fp"] == mx
        assert k["doc_id"] == min(
            m["doc_id"] for m in ms if m["score_fp"] == mx
        )
    # the quality rule must actually CHANGE some verdicts vs keep-min
    # (otherwise the composition demonstrates nothing at this sf)
    keepers = {r["doc_id"] for r in rows if r["keep"]}
    min_keepers = {min(m["doc_id"] for m in ms) for ms in by_comp.values()}
    assert keepers != min_keepers


def test_keep_best_quality_reads_artifacts_not_corpus(spark, sf_dir):
    """r11 verdict ask #4 plan gate: the declared keeper-selection plan
    composes the two MATERIALIZED artifacts (cluster map + score
    table) — documents.parquet must never appear in it; the corpus is
    read only inside the one-time artifact builds.  The end-to-end
    recompute equivalence lives in
    test_keep_best_quality_selects_cluster_max (its comparison sides
    recompute both pipelines fresh)."""
    from test_plan_quality import plan_of

    plan = plan_of(spark, "dedup_keep_best_quality", sf_dir)
    assert plan.count("documents.parquet") == 0, plan
    assert plan.count("dedup_cluster_map") == 1, plan
    assert plan.count("quality_scores") == 1, plan


def test_compact_minhash_index_restores_capped_invariant(spark, tmp_path):
    """r12: `compact_minhash_index` is the OPTIMIZE step the append
    path's docstring promises — after appends break the pre-capped
    invariant (marker dropped, buckets past BUCKET_CAP), compaction
    must (a) keep exactly the members probe-time capping would keep,
    so probes before/after see identical candidates, (b) leave no
    bucket over the cap, and (c) restore the ``_CAPPED`` marker."""
    import os

    from pyspark.sql import functions as F

    from kinesis_handler_spark.functions.lsh import (
        BUCKET_CAP,
        cap_band_buckets,
    )
    from kinesis_handler_spark.queries.llm import (
        append_to_minhash_index,
        compact_minhash_index,
        minhash_band_frame,
    )

    txt = "replicated boilerplate navigation footer text appearing on " \
          "every page of the crawl forty words would be better but ten do"
    schema = "doc_id bigint, text string"
    # snapshot: 50 identical docs (every band bucket width 50)
    df_a = spark.createDataFrame(
        [(i, txt) for i in range(50)]
        + [(900 + i, f"distinct doc number {i} with its own words entirely "
                     f"unshared across the corpus variant {i}")
           for i in range(5)],
        schema,
    )
    # appended batch: 30 more copies -> buckets hit 80 > BUCKET_CAP
    df_b = spark.createDataFrame(
        [(100 + i, txt) for i in range(30)], schema
    )
    idx_path = str(tmp_path / "idx")
    minhash_band_frame(df_a).write.parquet(idx_path)
    open(os.path.join(idx_path, "_CAPPED"), "w").close()
    append_to_minhash_index(idx_path, df_b)
    assert not os.path.exists(os.path.join(idx_path, "_CAPPED"))

    pre = spark.read.parquet(idx_path)
    widths = pre.groupBy("band", "band_sig").count()
    assert widths.agg(F.max("count")).collect()[0][0] == 80  # cap broken
    read_capped, _ = cap_band_buckets(pre, "doc_id", ("band", "band_sig"))
    expect = {
        (r["doc_id"], r["band"], r["band_sig"])
        for r in read_capped.collect()
    }

    compact_minhash_index(spark, idx_path)

    assert os.path.exists(os.path.join(idx_path, "_CAPPED"))
    post = spark.read.parquet(idx_path)
    got = {
        (r["doc_id"], r["band"], r["band_sig"]) for r in post.collect()
    }
    assert got == expect  # probe-equivalence: same member set
    post_widths = post.groupBy("band", "band_sig").count()
    assert post_widths.agg(F.max("count")).collect()[0][0] <= BUCKET_CAP
    # the kept members of the mega-bucket are the 50 snapshot ids plus
    # the 14 lowest appended ids (global doc_id rank, not arrival rank)
    mega = sorted(
        r["doc_id"]
        for r in post.filter(F.col("band") == 0)
        .join(
            post.filter(F.col("band") == 0)
            .groupBy("band_sig").count().filter(F.col("count") > 5)
            .select("band_sig"),
            "band_sig",
            "left_semi",
        )
        .select("doc_id").distinct().collect()
    )
    assert mega == list(range(50)) + list(range(100, 114))


def test_incremental_probe_over_bucketed_index_no_index_shuffle(
    spark, sf_dir, tmp_path
):
    """The 100 TB shape of the incremental probe join (r12): when the
    corpus band index is too big to broadcast, a BUCKETED index table
    (CLUSTERED BY the join keys) joins with ZERO exchange on the index
    side — only the O(batch) probe side repartitions — and appends via
    `append_bucketed` keep that property.  Candidates are identical to
    the broadcast-path join."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.functions.lineage import truncate
    from kinesis_handler_spark.functions.lsh import cap_band_buckets
    from kinesis_handler_spark.io.bucketing import (
        append_bucketed,
        read_bucketed,
        write_bucketed,
    )
    from kinesis_handler_spark.queries.llm import (
        _batch_slice,
        _corpus_snapshot,
        minhash_band_frame,
    )

    snap = _corpus_snapshot(spark, sf_dir)
    half_a = snap.filter(F.col("doc_id") % 2 == 0)
    half_b = snap.filter(F.col("doc_id") % 2 == 1)
    capped_a, _ = cap_band_buckets(
        minhash_band_frame(half_a), "doc_id", ("band", "band_sig")
    )
    write_bucketed(
        capped_a.select("doc_id", "band", "band_sig"),
        "mh_idx_b",
        ["band", "band_sig"],
        8,
        path=str(tmp_path / "mh_idx_b"),
        sort_cols=["band", "band_sig"],
    )
    try:
        capped_b, _ = cap_band_buckets(
            minhash_band_frame(half_b), "doc_id", ("band", "band_sig")
        )
        append_bucketed(
            spark,
            capped_b.select("doc_id", "band", "band_sig"),
            "mh_idx_b",
            path=str(tmp_path / "mh_idx_b"),
        )
        probe = minhash_band_frame(_batch_slice(spark, sf_dir)).transform(
            truncate
        )
        idx = read_bucketed(spark, "mh_idx_b").select(
            F.col("doc_id").alias("corpus_doc"), "band", "band_sig"
        )
        cand = probe.join(idx, ["band", "band_sig"]).select(
            F.least("doc_id", "corpus_doc").alias("doc_a"),
            F.greatest("doc_id", "corpus_doc").alias("doc_b"),
        ).distinct()

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = spark._jvm.PythonSQLUtils.explainString(
                cand._jdf.queryExecution(), "formatted"
            )
            # the bucketed scan feeds the join directly; the only hash
            # exchanges are the probe-side repartition and the final
            # pair-level distinct — never a re-shuffle of the index
            assert "Bucketed: true" in plan, plan
            n_exchanges = plan.count("Exchange hashpartitioning")
            assert n_exchanges <= 2, plan
            bucketed_pairs = {
                (r["doc_a"], r["doc_b"]) for r in cand.collect()
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

        # identical candidates via the broadcast path over a plain scan
        full_idx = (
            capped_a.select("doc_id", "band", "band_sig")
            .unionByName(capped_b.select("doc_id", "band", "band_sig"))
            .select(F.col("doc_id").alias("corpus_doc"), "band", "band_sig")
        )
        expect = {
            (r["doc_a"], r["doc_b"])
            for r in probe.join(full_idx, ["band", "band_sig"])
            .select(
                F.least("doc_id", "corpus_doc").alias("doc_a"),
                F.greatest("doc_id", "corpus_doc").alias("doc_b"),
            )
            .distinct()
            .collect()
        }
        assert bucketed_pairs == expect and bucketed_pairs
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_idx_b")
