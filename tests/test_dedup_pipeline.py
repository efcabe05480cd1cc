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
