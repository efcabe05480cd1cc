"""Copy-on-write MERGE mechanics (io/merge.py) — the storage-protocol
half of table-format MERGE (value parity of the merged rows is the
oracle-backed ``merge_cow_parquet`` query's job):

* file-range pruning really skips files — a merge touching one key
  subrange rewrites only the intersecting files and carries the rest
  BY REFERENCE (same path, byte-identical on disk);
* all three MERGE arms (update / delete / insert) land correctly;
* time travel: every committed version stays readable and immutable;
* crash safety: an uncommitted manifest (no pointer rename) is
  invisible to readers;
* vacuum removes only files unreachable from the kept versions.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from kinesis_handler_spark.io.merge import (
    create_table,
    merge_into,
    read_manifest,
    read_table,
    vacuum,
)


def _mk_target(spark, root):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("bigint").alias("val"),
        F.lit("orig").alias("tag"),
    )
    return create_table(df, root, "k", n_files=8)


def _file_sha(root, name):
    with open(os.path.join(root, name), "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def test_merge_arms_and_pruning(spark, tmp_path):
    root = str(tmp_path / "t")
    st0 = _mk_target(spark, root)
    assert st0.version == 1 and st0.files_total == 8

    m1 = read_manifest(root)
    pre_sha = {e["path"]: _file_sha(root, e["path"]) for e in m1["files"]}

    # feed touches ONLY keys 0..99 (one tail of the range partitioning)
    # plus brand-new keys 5000..5009
    feed = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("nv")
    ).unionByName(
        spark.range(5000, 5010).select(
            F.col("id").alias("k"), F.lit(1).cast("bigint").alias("nv")
        )
    )
    st1 = merge_into(
        spark,
        root,
        feed,
        update={"val": F.col("src_nv"), "tag": F.lit("upd")},
        delete_when=F.col("src_nv") % 10 == 3,  # keys 3,13,...,93
        insert_select=[
            F.col("src_k"),
            F.col("src_nv"),
            F.lit("ins"),
        ],
    )
    assert st1.version == 2
    # pruning: the 100-key slice + inserts intersect a strict subset
    assert 0 < st1.files_rewritten < st0.files_total
    assert st1.files_carried == st0.files_total - st1.files_rewritten
    assert st1.rows_deleted == 10 and st1.rows_inserted == 10

    # carried files are the SAME files — path and bytes
    m2 = read_manifest(root)
    carried = {e["path"] for e in m2["files"]} & set(pre_sha)
    assert len(carried) == st1.files_carried
    for p in carried:
        assert _file_sha(root, p) == pre_sha[p]

    # value semantics of all three arms
    rows = {r["k"]: r for r in read_table(spark, root).collect()}
    assert len(rows) == 1000 - 10 + 10
    for k in range(100):
        if (k + 100) % 10 == 3:
            assert k not in rows  # deleted
        else:
            assert rows[k]["val"] == k + 100 and rows[k]["tag"] == "upd"
    for k in range(100, 1000):
        assert rows[k]["val"] == k % 7 and rows[k]["tag"] == "orig"
    for k in range(5000, 5010):
        assert rows[k]["val"] == 1 and rows[k]["tag"] == "ins"

    # time travel: version 1 still reads as the original
    v1 = read_table(spark, root, version=1)
    assert v1.count() == 1000
    assert v1.filter(F.col("tag") != "orig").count() == 0


def test_read_table_key_between_skips_files(spark, tmp_path):
    """r10 verdict ask #3: ``read_table(key_between=(lo, hi))`` must
    prune the scan's FILE LIST against the manifest envelopes (data
    skipping), not just filter rows after a full scan — and must lose
    no rows vs the post-hoc filter."""
    root = str(tmp_path / "t")
    _mk_target(spark, root)  # 1000 keys, 8 range-partitioned files
    m = read_manifest(root)
    lo, hi = 150, 249
    expect = {
        e["path"] for e in m["files"]
        if e["min_key"] <= hi and e["max_key"] >= lo
    }
    assert 0 < len(expect) < len(m["files"])  # a strict subset exists

    pruned = read_table(spark, root, key_between=(lo, hi))
    scanned = {os.path.basename(p) for p in pruned.inputFiles()}
    assert scanned == expect, "scan lists non-intersecting files"

    full = read_table(spark, root).filter(
        (F.col("k") >= lo) & (F.col("k") <= hi)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_pruned_read_on_evolved_table_aligns_schema(spark, tmp_path):
    """Data skipping composed with schema evolution: a pruned read whose
    surviving files are all NARROW (pre-evolution) must still come back
    aligned to the manifest's widened schema, NULL-filled."""
    root = str(tmp_path / "t")
    _mk_target(spark, root)
    feed = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    merge_into(spark, root, feed, update={}, evolve_schema=True, n_files=2)

    # a high-range slice: every surviving file is carried + narrow
    high = read_table(spark, root, key_between=(800, 899))
    assert high.columns == ["k", "val", "tag", "score"]
    rows = high.collect()
    assert len(rows) == 100
    assert all(r["score"] is None for r in rows)
    # and a low-range slice that reads only the evolved files
    low = read_table(spark, root, key_between=(0, 10))
    assert {r["k"]: r["score"] for r in low.collect()} == {
        k: float(k * 2) for k in range(11)
    }


def test_uncommitted_manifest_is_invisible(spark, tmp_path):
    import json

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    # simulate a writer that crashed after writing manifest-v2 but
    # BEFORE the pointer rename: readers must keep seeing v1
    m = read_manifest(root)
    m["version"] = 2
    m["files"] = []
    with open(os.path.join(root, "manifest-v2.json"), "w") as fh:
        json.dump(m, fh)
    assert read_manifest(root)["version"] == 1
    assert read_table(spark, root).count() == 1000


def test_vacuum_keeps_reachable_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_target(spark, root)
    feed = spark.range(50).select(
        F.col("id").alias("k"), F.lit(9).cast("bigint").alias("nv")
    )
    merge_into(
        spark, root, feed,
        update={"val": F.col("src_nv")},
        insert_select=[F.col("src_k"), F.col("src_nv"), F.lit("ins")],
    )
    before = read_table(spark, root).count()
    removed = vacuum(root, keep_versions=1)
    assert removed, "vacuum removed nothing despite a rewritten file"
    # latest version unaffected; v1 manifest gone
    assert read_table(spark, root).count() == before
    assert not os.path.exists(os.path.join(root, "manifest-v1.json"))
    # every file the latest manifest references still exists
    for e in read_manifest(root)["files"]:
        assert os.path.exists(os.path.join(root, e["path"]))


def test_merge_into_empty_table_inserts_everything(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(
        spark.range(0).select(
            F.col("id").alias("k"),
            F.col("id").alias("val"),
            F.lit("x").alias("tag"),
        ),
        root,
        "k",
    )
    assert read_table(spark, root).count() == 0  # typed empty read
    feed = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").alias("nv")
    )
    st = merge_into(
        spark, root, feed,
        update={"val": F.col("src_nv")},
        insert_select=[F.col("src_k"), F.col("src_nv"), F.lit("ins")],
    )
    assert st.rows_inserted == 5 and st.files_rewritten == 0
    assert read_table(spark, root).count() == 5


def test_compact_preserves_values_and_shrinks_files(spark, tmp_path):
    from kinesis_handler_spark.io.merge import compact

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    # three incremental merges -> file count grows with merge count
    for lo in (0, 200, 400):
        feed = spark.range(lo, lo + 50).select(
            F.col("id").alias("k"), (F.col("id") + 1).alias("nv")
        )
        merge_into(
            spark, root, feed,
            update={"val": F.col("src_nv")},
            insert_select=[F.col("src_k"), F.col("src_nv"), F.lit("ins")],
        )
    before_rows = sorted(
        map(tuple, read_table(spark, root).collect())
    )
    n_before = len(read_manifest(root)["files"])
    st = compact(spark, root, target_files=4)
    m = read_manifest(root)
    assert len(m["files"]) <= 4 < n_before
    assert st.files_rewritten == n_before
    after_rows = sorted(map(tuple, read_table(spark, root).collect()))
    assert after_rows == before_rows  # value-identical
    # pre-compaction version still time-travels
    assert read_table(spark, root, version=st.version - 1).count() == len(
        before_rows
    )


def test_schema_evolution_add_column(spark, tmp_path):
    """r9 verdict ask #2: a MERGE whose source adds a column widens the
    table schema on commit; carried files stay byte-identical under
    their narrow schema and read back NULL for the new column."""
    import json

    root = str(tmp_path / "t")
    st0 = _mk_target(spark, root)
    m1 = read_manifest(root)
    pre_sha = {e["path"]: _file_sha(root, e["path"]) for e in m1["files"]}

    # feed touches only keys 0..49 and carries a brand-new column
    feed = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    st1 = merge_into(
        spark, root, feed, update={}, evolve_schema=True, n_files=2
    )
    assert st1.version == 2 and st1.cols_added == 1
    assert 0 < st1.files_rewritten < st0.files_total

    m2 = read_manifest(root)
    widened = json.loads(m2["schema"])
    assert [f["name"] for f in widened["fields"]] == ["k", "val", "tag",
                                                      "score"]
    # carried files: same path, same bytes, narrow per-file schema
    carried = {e["path"] for e in m2["files"]} & set(pre_sha)
    assert len(carried) == st1.files_carried > 0
    for e in m2["files"]:
        names = [f["name"] for f in json.loads(e["schema"])["fields"]]
        if e["path"] in carried:
            assert _file_sha(root, e["path"]) == pre_sha[e["path"]]
            assert "score" not in names
        else:
            assert names[-1] == "score"

    cur = read_table(spark, root)
    assert cur.columns == ["k", "val", "tag", "score"]
    rows = {r["k"]: r for r in cur.collect()}
    assert len(rows) == 1000
    for k, r in rows.items():
        if k < 50:  # matched: evolved column takes the source value
            assert r["score"] == float(k * 2), k
        else:  # unmatched in touched files AND carried files: NULL
            assert r["score"] is None, k
        assert (r["val"], r["tag"]) == (k % 7, "orig")  # values untouched

    # time travel: v1 still reads with the narrow schema
    v1 = read_table(spark, root, version=1)
    assert v1.columns == ["k", "val", "tag"]
    assert v1.count() == 1000

    # a later non-evolving merge over the evolved table still works and
    # inserts populate the evolved column through the default arm
    feed2 = spark.range(2000, 2010).select(
        F.col("k") if False else F.col("id").alias("k"),
        F.lit(5).cast("bigint").alias("val"),
        F.lit("ins").alias("tag"),
        F.lit(1.5).alias("score"),
    )
    st2 = merge_into(spark, root, feed2, update={})
    assert st2.cols_added == 0 and st2.rows_inserted == 10
    got = {
        r["k"]: r["score"]
        for r in read_table(spark, root).filter(F.col("k") >= 2000).collect()
    }
    assert got == {k: 1.5 for k in range(2000, 2010)}


def test_post_evolution_merge_touching_mixed_schema_files(spark, tmp_path):
    """ADVICE r10 (high): after an add-column evolution the table holds
    wide (rewritten) and narrow (carried) files side by side; a later
    merge whose touched set MIXES the two must read them aligned to the
    manifest schema, not whichever footer Spark samples first (plain
    spark.read.parquet raised UNRESOLVED_COLUMN on the evolved column).
    Repro shape: evolve on keys 0-49, then merge keys 0/400/800 — one
    wide file, two narrow ones."""
    root = str(tmp_path / "t")
    _mk_target(spark, root)
    feed = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    merge_into(spark, root, feed, update={}, evolve_schema=True, n_files=2)

    # touched set now spans the evolved file (k=0) and carried narrow
    # files (k=400, 800); the update arm reads the evolved column
    feed2 = spark.createDataFrame(
        [(0,), (400,), (800,)], "k bigint"
    ).select("k", F.lit(7.5).alias("score"))
    st = merge_into(
        spark, root, feed2,
        update={"score": F.col("src_score")},
        evolve_schema=True,
    )
    assert st.cols_added == 0 and st.rows_inserted == 0
    assert st.files_rewritten >= 2  # provably mixed narrow+wide
    rows = {r["k"]: r for r in read_table(spark, root).collect()}
    assert len(rows) == 1000
    for k in (0, 400, 800):
        assert rows[k]["score"] == 7.5, k
    assert rows[1]["score"] == 2.0  # untouched evolved value survives
    assert rows[401]["score"] is None  # rewritten narrow rows stay NULL
    assert rows[401]["val"] == 401 % 7 and rows[401]["tag"] == "orig"


def test_schema_evolution_is_opt_in_and_add_only(spark, tmp_path):
    import pytest

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    feed = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1.0).alias("extra")
    )
    # default: extra source columns are expression-only, schema frozen
    merge_into(spark, root, feed, update={})
    assert read_table(spark, root).columns == ["k", "val", "tag"]
    # evolving with a type conflict on an existing column is a hard error
    bad = spark.range(10).select(
        F.col("id").alias("k"), F.lit("not-a-number").alias("val")
    )
    with pytest.raises(TypeError, match="add-only"):
        merge_into(spark, root, bad, update={}, evolve_schema=True)


def _touched_for(manifest, lo, hi):
    """The manifest files a [lo, hi] key interval intersects."""
    return {
        e["path"] for e in manifest["files"]
        if e["min_key"] <= hi and e["max_key"] >= lo
    }


def _entries_for(spark, root, manifest, touched, tag):
    """Write a prepared-but-uncommitted rewrite of the FULL key span of
    ``touched`` (a real merge rewrites whole files, carrying their
    untouched rows); returns the new manifest entries and the span."""
    from kinesis_handler_spark.io.merge import _write_data_files

    spans = [
        (e["min_key"], e["max_key"])
        for e in manifest["files"] if e["path"] in touched
    ]
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    df = spark.range(lo, hi + 1).select(
        F.col("id").alias("k"),
        F.lit(999).cast("bigint").alias("val"),
        F.lit(tag).alias("tag"),
    )
    return _write_data_files(df, root, "k", 1), (lo, hi)


def test_disjoint_concurrent_merges_both_land(spark, tmp_path):
    """Optimistic concurrency: a writer holding a STALE snapshot whose
    footprint is disjoint from the rival commit REBASES and lands; both
    merges are visible, the rival's files carry forward."""
    from kinesis_handler_spark.io.merge import commit_merge

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    m1 = read_manifest(root)

    # rival writer commits first: update keys 0..49 through merge_into
    feed = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") + 500).alias("nv")
    )
    st_a = merge_into(spark, root, feed, update={"val": F.col("src_nv")})
    assert st_a.version == 2

    # stale writer: prepared against v1, rewrites the top key slice
    touched = _touched_for(m1, 900, 999)
    assert touched  # test premise: the slice maps to real v1 files
    entries, itv = _entries_for(spark, root, m1, touched, "rebased")
    version, carried = commit_merge(
        root, m1, touched, entries, m1.get("schema"), itv
    )
    assert version == 3

    cur = {r["k"]: (r["val"], r["tag"]) for r in read_table(spark, root).collect()}
    assert len(cur) == 1000
    assert cur[10] == (510, "orig")        # rival's update survived
    assert cur[950] == (999, "rebased")    # stale writer's slice landed
    assert cur[500] == (500 % 7, "orig")   # untouched middle intact


def test_overlapping_concurrent_merge_conflicts(spark, tmp_path):
    """A stale writer whose footprint overlaps the rival commit must
    raise ConcurrentMergeError — never silently lose the rival's
    update; merge_into cleans its orphaned data files on conflict."""
    import os as _os

    import pytest

    from kinesis_handler_spark.io.merge import (
        ConcurrentMergeError,
        commit_merge,
    )

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    m1 = read_manifest(root)

    feed = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") + 500).alias("nv")
    )
    merge_into(spark, root, feed, update={"val": F.col("src_nv")})
    rewritten_by_rival = {
        e["path"] for e in m1["files"]
    } - {e["path"] for e in read_manifest(root)["files"]}
    assert rewritten_by_rival

    # case 1: stale writer touched a file the rival rewrote
    entries, _ = _entries_for(
        spark, root, m1, _touched_for(m1, 0, 49), "stale"
    )
    with pytest.raises(ConcurrentMergeError, match="rewrote a file"):
        commit_merge(
            root, m1, set(rewritten_by_rival), entries,
            m1.get("schema"), (0, 49),
        )

    # case 2: disjoint touched set but overlapping source-key interval
    # (the rival ADDED files covering keys 0..49; our matched/unmatched
    # decisions for that interval are stale)
    with pytest.raises(ConcurrentMergeError, match="key interval"):
        commit_merge(
            root, m1, set(), entries, m1.get("schema"), (0, 49)
        )
    for e in entries:  # direct commit_merge does not clean up
        _os.remove(_os.path.join(root, e["path"]))

    # table is exactly the rival's version — nothing leaked in
    assert read_manifest(root)["version"] == 2
    got = {r["k"]: r["val"] for r in read_table(spark, root).collect()}
    assert got[10] == 510 and len(got) == 1000


def test_version_race_both_writers_land(spark, tmp_path):
    """Two writers racing for the same version number: the link-CAS
    gives each a distinct version and the loser rebases — both land,
    the pointer ends at the max, no regression."""
    import threading

    from kinesis_handler_spark.io.merge import commit_merge

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    m1 = read_manifest(root)

    lo_touched = _touched_for(m1, 0, 49)
    hi_touched = _touched_for(m1, 950, 999)
    assert not (lo_touched & hi_touched)  # premise: disjoint slices
    e_lo, itv_lo = _entries_for(spark, root, m1, lo_touched, "lo")
    e_hi, itv_hi = _entries_for(spark, root, m1, hi_touched, "hi")

    results, errors = [], []
    barrier = threading.Barrier(2)

    def commit(touched, entries, itv):
        try:
            barrier.wait()
            results.append(
                commit_merge(root, m1, touched, entries,
                             m1.get("schema"), itv)
            )
        except Exception as exc:  # noqa: BLE001 - surfaced below
            errors.append(exc)

    t1 = threading.Thread(
        target=commit, args=(lo_touched, e_lo, itv_lo)
    )
    t2 = threading.Thread(
        target=commit, args=(hi_touched, e_hi, itv_hi)
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    assert sorted(v for v, _ in results) == [2, 3]
    assert read_manifest(root)["version"] == 3
    got = {r["k"]: r["tag"] for r in read_table(spark, root).collect()}
    assert got[10] == "lo" and got[975] == "hi" and got[500] == "orig"
    assert len(got) == 1000


def test_crash_between_link_and_pointer_is_durable_not_visible(
    spark, tmp_path
):
    """A writer crashing after manifest-link but before pointer-advance:
    readers still see the old version; the NEXT writer rebases onto the
    orphaned commit and publishes both (WAL-before-checkpoint shape)."""
    from kinesis_handler_spark.io.merge import (
        _link_manifest,
        commit_merge,
    )

    root = str(tmp_path / "t")
    _mk_target(spark, root)
    m1 = read_manifest(root)

    # "crashed" writer: links v2 rewriting the low slice, never advances
    lo_touched = _touched_for(m1, 0, 49)
    e_lo, _ = _entries_for(spark, root, m1, lo_touched, "crashed")
    carried = [e for e in m1["files"] if e["path"] not in lo_touched]
    assert _link_manifest(root, 2, {
        "version": 2, "key": "k", "files": carried + e_lo,
        "parent": 1, "schema": m1.get("schema"),
    })
    # readers still see v1 — the crash is invisible
    assert read_manifest(root)["version"] == 1
    assert {r["tag"] for r in read_table(spark, root).collect()} == {"orig"}

    # next writer (disjoint) commits: rebases onto the orphan, v3 wins
    hi_touched = _touched_for(m1, 950, 999)
    e_hi, itv_hi = _entries_for(spark, root, m1, hi_touched, "next")
    version, _ = commit_merge(
        root, m1, hi_touched, e_hi, m1.get("schema"), itv_hi
    )
    assert version == 3 and read_manifest(root)["version"] == 3
    got = {r["k"]: r["tag"] for r in read_table(spark, root).collect()}
    assert got[10] == "crashed" and got[975] == "next"
