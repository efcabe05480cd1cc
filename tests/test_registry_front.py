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
# out, so the guard is strict again: rows-only queries NEVER occupy a
# verdict slot.
ROWS_ONLY_COLD_EXEC: set[str] = set()


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


def test_rows_only_queries_come_last():
    names = [n for n in all_queries() if n not in ROWS_ONLY_COLD_EXEC]
    kinds = [QUERIES[n].oracle is None for n in names]
    first_rows_only = kinds.index(True) if True in kinds else len(names)
    assert all(kinds[first_rows_only:]), (
        "oracle-backed query ordered after a rows-only one"
    )
