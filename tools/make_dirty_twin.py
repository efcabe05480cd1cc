"""Build a NULL-riddled twin corpus for CROSS-ENGINE parity sweeps.

tests/test_null_input.py pins that every query EXECUTES on dirty input;
this twin goes further: it is written by DuckDB so every column keeps
its original physical parquet type (notably events.ts stays
TIMESTAMP_NS, which a Spark rewrite would flatten to int64), making it
valid input for tools/check_oracle.py — i.e. the full Spark-vs-DuckDB
hash comparison can run ON DIRTY DATA.  A mismatch there is a genuine
impl/oracle NULL-semantics drift (the ADVICE round-4 drift class), not
a fixture artifact.

Modes (second positional arg of :func:`build`):

* ``nulls`` (default) — per table: 20 real rows + 5 rows with every
  non-leading column NULL + 3 all-NULL rows.
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

Usage: PYTHONPATH=. python tools/make_dirty_twin.py [src_sf_dir] [out_dir] [mode]
"""

from __future__ import annotations

import os
import sys

import duckdb

from kinesis_handler_spark.tables import TABLES


def build(src: str, out: str, mode: str = "nulls") -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{src}/{t}.parquet"
        cols = con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        names = [c[0] for c in cols]
        types = {c[0]: c[1] for c in cols}
        if mode == "empty":
            body = f"SELECT * FROM '{path}' LIMIT 0"
        elif mode == "ragged":
            if t == "embeddings":
                body = f"""
                  (SELECT * FROM '{path}' LIMIT 20)
                  UNION ALL BY NAME
                  (SELECT vec_id + 900000 AS vec_id,
                          CASE CAST(vec_id % 3 AS INTEGER)
                            WHEN 0 THEN []::FLOAT[]
                            WHEN 1 THEN embedding[1:32]
                            ELSE list_append(embedding[1:63], NULL::FLOAT)
                          END AS embedding,
                          label
                   FROM '{path}' LIMIT 3)
                """
            else:
                body = f"SELECT * FROM '{path}' LIMIT 20"
        elif mode == "unicode":
            if t == "documents":
                texts = [
                    "hello \U0001f600\U0001f30d world \U0001f468‍"
                    "\U0001f469‍\U0001f467‍\U0001f466 emoji",
                    "这是测试 文档 日本"
                    "語 テスト cjk mix",
                    "مرحبا بال"
                    "عالم hello rtl",
                    "café naïve combining marks",
                    "a​b c zero​width straße "
                    "İstanbul",
                ]
                rows = ", ".join(
                    "(90000{}, {}, 'xx', 'unicode')".format(
                        k, "'" + txt.replace("'", "''") + "'"
                    )
                    for k, txt in enumerate(texts)
                )
                body = f"""
                  (SELECT * FROM '{path}' LIMIT 20)
                  UNION ALL BY NAME
                  (SELECT doc_id, text, CAST(length(text) AS INTEGER)
                            AS n_chars, lang, source
                   FROM (VALUES {rows}) v(doc_id, text, lang, source))
                """
            else:
                body = f"SELECT * FROM '{path}' LIMIT 20"
        elif mode == "dups":
            body = f"""
              (SELECT * FROM '{path}' LIMIT 20)
              UNION ALL BY NAME
              (SELECT * FROM '{path}' LIMIT 5)
              UNION ALL BY NAME
              (SELECT * FROM '{path}' LIMIT 5)
            """
        else:
            all_null = ", ".join(
                f'CAST(NULL AS {types[c]}) AS "{c}"' for c in names
            )
            partial = ", ".join(
                [f'"{names[0]}"']
                + [f'CAST(NULL AS {types[c]}) AS "{c}"' for c in names[1:]]
            )
            body = f"""
              (SELECT * FROM '{path}' LIMIT 20)
              UNION ALL BY NAME
              (SELECT {partial} FROM '{path}' LIMIT 5)
              UNION ALL BY NAME
              (SELECT {all_null} FROM range(3))
            """
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
