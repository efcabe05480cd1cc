"""Registry front-50 hygiene: the external driver hash-checks only the
first 50 queries() entries, so a malformed _FRONT (typo from a manual
edit, rows-only query burning a verdict slot, duplicate) silently
wastes verdict slots for a whole round.  Pin the invariants."""

from __future__ import annotations

from kinesis_handler_spark.registry import _FRONT, QUERIES, all_queries

# One-time exceptions for rows-only queries that need fresh driver rows
# evidence (a plan re-band or a brand-new operator with no SQL oracle)
# may be added here for a single round; the r7 trio (dedup_simhash,
# embed_pca, tokenizer_bpe_train) got its evidence in r7/r8 and rotated
# out, as did the r11 quartet (dedup_incremental_minhash,
# text_quality_classifier, dedup_keep_best_quality, tokenizer_bpe_apply)
# after their r11 cold-exec round.  r12 (r11 verdict ask #1): the two
# r11 additions with ZERO driver-side evidence of any kind take their
# one cold-exec round, then rotate out again.
ROWS_ONLY_COLD_EXEC: set[str] = {
    "sim_ann_incremental",
    "text_langid_classifier",
}


def test_front_entries_are_registered_and_unique():
    qs = all_queries()  # triggers registration
    assert len(_FRONT) == len(set(_FRONT)), "duplicate names in _FRONT"
    missing = [n for n in _FRONT if n not in QUERIES]
    assert not missing, f"_FRONT names not registered: {missing}"
    # driver order must begin with _FRONT verbatim
    assert list(qs)[: len(_FRONT)] == _FRONT


def test_front_fills_all_50_verdict_slots():
    assert len(_FRONT) >= 50, "verdict slots left unfilled"
    no_oracle = [
        n
        for n in _FRONT[:50]
        if QUERIES[n].oracle is None and n not in ROWS_ONLY_COLD_EXEC
    ]
    assert not no_oracle, (
        f"rows-only queries burning verdict slots: {no_oracle}"
    )


def test_changed_since_checked_queries_are_in_front():
    """r9 verdict ask #8: a query whose SOURCE changed after its last
    driver hash-check keeps a stale green verdict until rotation
    happens to reach it — unless we force it back into the front.
    tests/front_source_hashes.json records each oracle-backed query's
    source+oracle sha256 as of its last green driver check (regenerated
    at round start by tools/record_front_hashes.py, BEFORE any edits);
    any query whose current fingerprint differs MUST occupy a verdict
    slot this round.  Scope note: the fingerprint covers the registered
    function body + oracle SQL, not shared helpers — when a helper
    changes, front its callers by hand (see registry.source_fingerprint
    docstring)."""
    import json
    import pathlib

    from kinesis_handler_spark.registry import source_fingerprint

    all_queries()  # registration side effect
    rec_path = pathlib.Path(__file__).parent / "front_source_hashes.json"
    record = json.loads(rec_path.read_text())
    unknown = [n for n in record if n not in QUERIES]
    assert not unknown, f"recorded fingerprints for dead queries: {unknown}"
    changed = [
        n for n, rec in record.items()
        if source_fingerprint(n) != rec["sha"]
    ]
    stale = [n for n in changed if n not in _FRONT[:50]]
    assert not stale, (
        "queries rewritten since their last driver check but NOT in the "
        f"front-50 (stale green evidence): {stale} — add them to _FRONT "
        "or re-record after the driver re-checks them"
    )


def test_rows_only_queries_come_last():
    names = [n for n in all_queries() if n not in ROWS_ONLY_COLD_EXEC]
    kinds = [QUERIES[n].oracle is None for n in names]
    first_rows_only = kinds.index(True) if True in kinds else len(names)
    assert all(kinds[first_rows_only:]), (
        "oracle-backed query ordered after a rows-only one"
    )


def test_readme_counts_match_registry():
    """r10 verdict ask #6: README's 'X of Y queries hash-match ...
    remaining Z' sentence drifted once (180/194 survived two rounds of
    inventory growth); derive the truth from the registry so it can't
    drift silently again."""
    import pathlib
    import re

    all_queries()  # registration side effect
    total = len(QUERIES)
    oracle_backed = sum(1 for q in QUERIES.values() if q.oracle is not None)
    rows_only = total - oracle_backed
    text = (
        pathlib.Path(__file__).parents[1] / "README.md"
    ).read_text()
    m = re.search(
        r"(\d+) of (\d+) queries hash-match", text
    )
    assert m, "README lost the hash-match count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (oracle_backed, total), (
        f"README says {m.group(0)!r}; registry has "
        f"{oracle_backed} of {total}"
    )
    m2 = re.search(r"the remaining (\d+) are engine-specific", text)
    assert m2 and int(m2.group(1)) == rows_only, (
        f"README remaining-count drifted: registry has {rows_only}"
    )
