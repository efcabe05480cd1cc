"""Build hostile twin corpora for CROSS-ENGINE parity sweeps.

tests/test_null_input.py pins that every query EXECUTES on dirty input;
these twins go further: they are written by DuckDB so every column keeps
its original physical parquet type (notably events.ts stays
TIMESTAMP_NS, which a Spark rewrite would flatten to int64), making them
valid input for tools/check_oracle.py — i.e. the full Spark-vs-DuckDB
hash comparison can run ON DIRTY DATA.  A mismatch there is a genuine
impl/oracle semantics drift (the ADVICE round-4 drift class), not a
fixture artifact.

Modes (second positional arg of :func:`build`):

* ``nulls`` (default) — per table: 20 real rows + 5 rows with every
  non-leading column NULL + 3 all-NULL rows.  ``events``, ``orders``,
  ``lineitem`` and ``customer`` additionally get MIXED-null rows: live
  partition/join keys with NULL sort/measure columns on alternating
  rows — the ADVICE r5 shape that an all-or-nothing NULL pattern can
  never exercise (an unpinned window ORDER BY drifts between Spark's
  NULLS FIRST and DuckDB's NULLS LAST only when a NULL sort key
  appears inside a live partition key; round 6 caught six such queries
  the moment the events twin gained these rows).
* ``dups`` — per table: 20 real rows + the first 5 duplicated verbatim
  (twice more).  Catches per-row-impl vs GROUP-BY-oracle drift (an
  oracle that aggregates away duplicate keys the implementation keeps —
  the ``multimodal_resize`` round-5 find) and any operator that quietly
  assumes key uniqueness.
* ``empty`` — zero rows, full schema.  Catches engine divergence on
  aggregates over nothing (the DuckDB-readable sibling of
  ``tests/test_empty_input.py``'s Spark-only twin).
* ``ragged`` — tables unchanged except ``embeddings``, which gains an
  empty vector, a 32-dim vector, and a 64-dim vector with a NULL last
  element.  Proves the vector loaders' dimension/element guards filter
  identically on both engines.
* ``unicode`` — tables unchanged except ``documents``, which gains rows
  whose text carries emoji (incl. ZWJ families / surrogate pairs), CJK,
  RTL scripts, combining marks, zero-width and non-break characters,
  and case-mapping edge cases (ß, İ).  Proves the text operators'
  length / case / regex / hash semantics agree across engines on the
  text a real web corpus contains.
* ``times`` — tables unchanged except ``events`` gains rows with
  extreme-but-legal timestamps (the TIMESTAMP_NS range edges 1677/2262
  — the driver's generator MAY ship events as parquet NANOS — plus
  pre-epoch negatives, epoch zero, a leap day) and ``orders`` /
  ``lineitem`` gain date extremes (0001-01-01, the 1582 Julian→
  Gregorian cutover straddle, 9999-12-31).  Proves the date/window
  arithmetic (date_trunc, epoch conversions, datediff, year
  extraction, interval windows) agrees across engines over the whole
  proleptic-Gregorian range, not just the fixture's native decade.
* ``keys`` — every keyed table gains rows whose key columns take
  extreme-but-legal 64-bit values (INT64 edges, negatives, a negative
  prime), with matching extremes across FK pairs so the join paths
  exercise them.  Proves key arithmetic (multiplicative hashes, bit
  ops, modulo filters, hash joins) is total and engine-aligned over
  the whole BIGINT range, not just the fixtures' small positives.
* ``json`` — ``events`` gains rows whose ``props`` payload is hostile
  but VALID JSON: int64-edge and beyond-int64 numbers (JSON numbers
  are unbounded), floats and scientific notation, quoted numbers,
  null/missing/case-mismatched keys, nested objects, arrays, booleans,
  1e400, and a field whose STRING value embeds a '"k": 123' decoy.
  Proves the JSON extraction path is total and that both engines parse
  (not regex-scrape) the payload.  Malformed JSON is deliberately
  excluded — that is the streaming dead-letter layer's contract
  (tests/test_routing_stream.py), not the batch oracles'.  Duplicate
  keys are also excluded: RFC 8259 leaves them interop-undefined and
  the engines genuinely differ (first-wins vs last-wins).
* ``chaos`` — all of the above at once: every table gets the NULL rows
  AND the duplicate rows; ``embeddings`` additionally gets the ragged
  vectors, ``documents`` the unicode rows, ``events`` / ``orders``
  / ``lineitem`` the extreme-temporal rows, and every keyed table the
  extreme-key rows.  The integration gate —
  catches interactions between the per-axis alignments (e.g. a
  duplicate key whose twin row is NULL-ridden).

Usage: PYTHONPATH=. python tools/make_dirty_twin.py [src_sf_dir] [out_dir] [mode]
"""

from __future__ import annotations

import os
import sys

import duckdb

from kinesis_handler_spark.tables import TABLES

_UNICODE_TEXTS = [
    "hello \U0001f600\U0001f30d world \U0001f468‍"
    "\U0001f469‍\U0001f467‍\U0001f466 emoji",
    "这是测试 文档 日本語 テスト cjk mix",
    "مرحبا بالعالم hello rtl",
    "café naïve combining marks",
    "a​b c zero​width straße İstanbul",
]


def _null_pieces(path: str, names: list[str], types: dict[str, str]):
    all_null = ", ".join(f'CAST(NULL AS {types[c]}) AS "{c}"' for c in names)
    partial = ", ".join(
        [f'"{names[0]}"']
        + [f'CAST(NULL AS {types[c]}) AS "{c}"' for c in names[1:]]
    )
    return [
        f"(SELECT {partial} FROM '{path}' LIMIT 5)",
        f"(SELECT {all_null} FROM range(3))",
    ]


def _mixed_null_events_piece(path: str):
    """Live partition keys with NULL sort/measure columns: NULL ts under
    a real user_id (rows 1-4), and NULL event_type/value under a real
    (user_id, ts) (rows 5-8).  event_id is offset so the rows never
    collide with the real slice."""
    return (
        f"(SELECT event_id + 800000 AS event_id,"
        f" CASE WHEN event_id % 2 = 0 THEN NULL ELSE ts END AS ts,"
        f" user_id,"
        f" CASE WHEN event_id % 2 = 1 THEN NULL ELSE event_type END"
        f"   AS event_type,"
        f" CASE WHEN event_id % 2 = 1 THEN NULL ELSE value END AS value,"
        f" props"
        f" FROM '{path}' LIMIT 8)"
    )


#: Key columns kept LIVE in the generic mixed-null pieces (the first
#: is also the offset/alternation key).  Every non-key column is
#: NULLed on an alternating half of the rows, so each (live-key,
#: NULL-measure) and (live-key, live-measure-with-NULL-sibling) combo
#: exists — the shape the all-or-nothing partial rows can never make.
_MIXED_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "customer": ["c_custkey", "c_nationkey"],
}
_MIXED_OFFSET = 700_000


def _mixed_null_piece(table: str, path: str, names: list[str]):
    keys = _MIXED_KEYS[table]
    alt = keys[0]
    cols = []
    for j, c in enumerate(names):
        if c == alt:
            cols.append(f'"{c}" + {_MIXED_OFFSET} AS "{c}"')
        elif c in keys:
            cols.append(f'"{c}"')
        else:
            cols.append(
                f'CASE WHEN ("{alt}" + {j}) % 2 = 0 THEN NULL '
                f'ELSE "{c}" END AS "{c}"'
            )
    return f"(SELECT {', '.join(cols)} FROM '{path}' LIMIT 8)"


#: Extreme-but-legal instants.  The first/last sit just inside the
#: parquet TIMESTAMP_NS int64 range (1677-09-21..2262-04-11) so the
#: twin stays valid whichever physical shape (NANOS or MICROS) the
#: source generation shipped; the middle ones cover pre-epoch negative
#: micros, epoch zero, and a leap day.
_EXTREME_TS = [
    "1677-09-22 00:00:01",
    "1969-12-31 23:59:59.999999",
    "1970-01-01 00:00:00",
    "2000-02-29 12:00:00",
    "2262-04-11 23:47:16",
    "1883-11-18 12:00:00",
]
#: Date extremes: calendar floor/ceiling plus the 1582 Julian→Gregorian
#: cutover straddle (both engines are proleptic Gregorian — these rows
#: prove it stays true).
_EXTREME_DATES = ["0001-01-01", "1582-10-04", "1582-10-15", "9999-12-31"]
_TIMES_OFFSET = 850_000


def _times_piece(table: str, path: str, names: list[str]):
    """Extreme-temporal rows: key offset so they never collide with the
    real slice; every non-temporal column kept live (the temporal
    hostility must interact with real group keys / measures)."""
    key_col, date_cols = {
        "events": ("event_id", ["ts"]),
        "orders": ("o_orderkey", ["o_orderdate"]),
        "lineitem": ("l_orderkey", ["l_shipdate"]),
    }[table]
    if table == "events":
        case = (
            "CASE CAST(rn % 6 AS INTEGER) "
            + " ".join(
                f"WHEN {i} THEN TIMESTAMP_NS '{s}'"
                for i, s in enumerate(_EXTREME_TS)
            )
            + " END"
        )
        n = 6
    else:
        case = (
            "CASE CAST(rn % 4 AS INTEGER) "
            + " ".join(
                f"WHEN {i} THEN DATE '{s}'"
                for i, s in enumerate(_EXTREME_DATES)
            )
            + " END"
        )
        n = 4
    sel = ", ".join(
        f'"{c}" + {_TIMES_OFFSET} AS "{c}"' if c == key_col
        else f'{case} AS "{c}"' if c in date_cols
        else f'"{c}"'
        for c in names
    )
    return (
        f"(SELECT {sel} FROM (SELECT *, row_number() OVER () AS rn"
        f" FROM '{path}' LIMIT {n}) s)"
    )


#: Extreme-but-legal 64-bit keys.  Scraper-assigned ids routinely come
#: from full-range hashes, so INT64 edges, negatives, and a large
#: negative prime are all legal key values; none collide with the
#: fixtures' small positive key space.  The same value list is used for
#: every key column, so extreme FKs MATCH across tables (an INT64_MIN
#: order joins an INT64_MIN customer) — the join paths must survive
#: them, not just orphan them.
_EXTREME_KEYS = [
    -9223372036854775808,  # INT64_MIN: negation/abs raise under ANSI
    -9223372036854775801,
    -999_983,  # negative prime — exercises % sign-of-dividend
    -1,
    9223372036854775800,
    9223372036854775807,  # INT64_MAX: any multiply/shift overflows
]
_KEYS_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["user_id", "event_id"],
}


#: Hostile-but-VALID JSON payloads (see module docstring for scope).
_HOSTILE_PROPS = [
    '{"k": -9223372036854775808}',
    '{"k": 9223372036854775807}',
    '{"k": 18446744073709551615}',
    '{"k": 1.5}',
    '{"k": 1.5e2}',
    '{"k": "99"}',
    '{"k": "1.5"}',
    '{"k": null}',
    "{}",
    '{"k": {"x": 1}}',
    '{"k": [1, 2]}',
    '{ "k" :\t4242 }',
    '{"K": 7}',
    '{"k": 1e400}',
    '{"k": true}',
    '{"trap": "\\"k\\": 123", "k": 5555}',
]
_JSON_OFFSET = 950_000


def _json_piece(path: str, names: list[str]):
    """Hostile-props rows: event_id offset past every other piece,
    every non-props column kept live."""
    n = len(_HOSTILE_PROPS)
    case = (
        f"CASE CAST(rn % {n} AS INTEGER) "
        + " ".join(
            "WHEN {} THEN '{}'".format(i, p.replace("'", "''"))
            for i, p in enumerate(_HOSTILE_PROPS)
        )
        + " END"
    )
    sel = ", ".join(
        f'"{c}" + {_JSON_OFFSET} AS "{c}"' if c == "event_id"
        else f'{case} AS "{c}"' if c == "props"
        else f'"{c}"'
        for c in names
    )
    return (
        f"(SELECT {sel} FROM (SELECT *, row_number() OVER () AS rn"
        f" FROM '{path}' LIMIT {n}) s)"
    )


def _keys_piece(table: str, path: str, names: list[str]):
    """Extreme-key rows: every key column of the table takes the rn-th
    extreme value (so FK pairs land on the SAME extreme and the joins
    actually match); every non-key column stays live so the hostile
    keys flow through real measures, text, and vectors."""
    keys = _KEYS_COLS[table]
    case = (
        "CASE CAST(rn % 6 AS INTEGER) "
        + " ".join(
            f"WHEN {i} THEN CAST('{v}' AS BIGINT)"
            for i, v in enumerate(_EXTREME_KEYS)
        )
        + " END"
    )
    sel = ", ".join(
        f'{case} AS "{c}"' if c in keys else f'"{c}"' for c in names
    )
    return (
        f"(SELECT {sel} FROM (SELECT *, row_number() OVER () AS rn"
        f" FROM '{path}' LIMIT 6) s)"
    )


def _null_lang_piece(path: str):
    """Live text under a NULL lang (doc_id offset past every other
    piece): the per-language operators must keep NULL lang as its own
    group end-to-end — ADVICE r10 found a non-null-safe lang join key
    that silently dropped these docs while the DuckDB oracle kept
    them.  The all-or-nothing null pieces can never exercise this
    (their text is NULL too, so the totality filter removes them)."""
    return (
        f"(SELECT doc_id + 960000 AS doc_id, text, n_chars,"
        f" CAST(NULL AS VARCHAR) AS lang, source"
        f" FROM '{path}' WHERE text IS NOT NULL LIMIT 4)"
    )


def _dup_pieces(path: str):
    return [
        f"(SELECT * FROM '{path}' LIMIT 5)",
        f"(SELECT * FROM '{path}' LIMIT 5)",
    ]


def _ragged_piece(path: str):
    return (
        f"(SELECT vec_id + 900000 AS vec_id,"
        f" CASE CAST(vec_id % 3 AS INTEGER)"
        f"   WHEN 0 THEN []::FLOAT[]"
        f"   WHEN 1 THEN embedding[1:32]"
        f"   ELSE list_append(embedding[1:63], NULL::FLOAT)"
        f" END AS embedding, label"
        f" FROM '{path}' LIMIT 3)"
    )


def _unicode_piece():
    rows = ", ".join(
        "(90000{}, {}, 'xx', 'unicode')".format(
            k, "'" + txt.replace("'", "''") + "'"
        )
        for k, txt in enumerate(_UNICODE_TEXTS)
    )
    return (
        "(SELECT doc_id, text, CAST(length(text) AS INTEGER) AS n_chars,"
        " lang, source"
        f" FROM (VALUES {rows}) v(doc_id, text, lang, source))"
    )


def build(src: str, out: str, mode: str = "nulls") -> None:
    # Wipe the output dir first: the fixture layer (_materialize,
    # ensure_bucketed) caches DERIVED artifacts (csv/json/orc twins,
    # bucketed tables) INSIDE the sf dir keyed by its basename, under
    # the assumption that sources are immutable.  Rebuilding a twin in
    # place with a newer recipe would leave those stale derived caches
    # pointing at the OLD data — exactly the drift the r6 parity
    # artifact caught when the twin recipe changed between runs.
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{src}/{t}.parquet"
        cols = con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        names = [c[0] for c in cols]
        types = {c[0]: c[1] for c in cols}
        if mode == "empty":
            body = f"SELECT * FROM '{path}' LIMIT 0"
        else:
            pieces = [f"(SELECT * FROM '{path}' LIMIT 20)"]
            if mode in ("nulls", "chaos"):
                pieces += _null_pieces(path, names, types)
                if t == "events":
                    pieces.append(_mixed_null_events_piece(path))
                if t in _MIXED_KEYS:
                    pieces.append(_mixed_null_piece(t, path, names))
                if t == "documents":
                    pieces.append(_null_lang_piece(path))
            if mode in ("dups", "chaos"):
                pieces += _dup_pieces(path)
            if t == "embeddings" and mode in ("ragged", "chaos"):
                pieces.append(_ragged_piece(path))
            if t == "documents" and mode in ("unicode", "chaos"):
                pieces.append(_unicode_piece())
            if t in ("events", "orders", "lineitem") and mode in (
                "times", "chaos"
            ):
                pieces.append(_times_piece(t, path, names))
            if t in _KEYS_COLS and mode in ("keys", "chaos"):
                pieces.append(_keys_piece(t, path, names))
            if t == "events" and mode in ("json", "chaos"):
                pieces.append(_json_piece(path, names))
            body = "\n UNION ALL BY NAME\n".join(pieces)
        con.execute(
            f"COPY ({body}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"dirty twin ({mode}) written to {out}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".fixture_cache",
            "sf_dirty",
        )
    )
    build(src, out, sys.argv[3] if len(sys.argv) > 3 else "nulls")
