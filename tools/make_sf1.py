"""Synthesize an sf1.0 corpus (10× sf0.1) for the scale probe.

The driver's generator (seed=42) is not available in-repo, so sf1.0 is
built by TILING the driver's own sf0.1 tables with key remapping — the
honest construction that preserves every distribution the bench is
sensitive to:

* per-key cardinalities and join fan-outs are IDENTICAL per tile (each
  tile is sf0.1 with disjoint key ranges, so customer→orders→lineitem
  selectivity, events-per-user, docs-per-source all hold);
* group-key cardinality scales ×10 exactly as the driver's sf0.01→sf0.1
  step scaled it (customers 15k→150k, users 1.5k→15k, …);
* bounded dims (region, nation) stay bounded — the broadcast-policy
  line the plan audit cares about;
* text/vector content is PERTURBED per tile (token prefix / dimension
  rotation) so dedup and ANN queries don't see a 10×-replicated corpus
  as millions of cross-tile exact duplicates — within-tile similarity
  structure is preserved, cross-tile similarity is noise, matching how
  a real corpus grows;
* embeddings scale ×4 (the driver's own 0.01→0.1 ratio — ANN cost is
  the per-SF embedding count, not the lineitem count).

Documented as a replica in SCALE.md — the probe measures how RUNTIME
scales with input size under a fixed plan, for which tiled data with
disjoint keys is as good as generator output.

Usage: PYTHONPATH=. python tools/make_sf1.py [out_dir] [factor]
``factor`` (default 1) multiplies every table's tile count: factor=3
builds an sf3.0 corpus (30 sf0.1 tiles) for the growth-exponent probe
(r8 verdict item 3).  Embedding dimension rotations repeat mod 4 past
factor 1 — vec_ids stay disjoint, and the probe queries
(graph/span/simhash) don't read embeddings, so the repetition only
matters if an ANN query is benched at factor>1 (documented, not
hidden).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# per-table: (tiles, {column: stride}) — key strides are the sf0.1 key-
# space sizes, so tiles occupy disjoint ranges.
TILED = {
    "customer": (10, {"c_custkey": 15_000}),
    "supplier": (10, {"s_suppkey": 1_000}),
    "part": (10, {"p_partkey": 20_000}),
    "orders": (10, {"o_orderkey": 150_000, "o_custkey": 15_000}),
    "lineitem": (
        10,
        {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    ),
    "events": (10, {"event_id": 100_000, "user_id": 1_500}),
    "documents": (10, {"doc_id": 5_000}),
    "embeddings": (4, {"vec_id": 2_000}),
}


def _tile_select(table: str, cols: list[str], strides: dict[str, int],
                 i: int) -> str:
    parts = []
    for c in cols:
        if c in strides:
            parts.append(f'"{c}" + {i * strides[c]} AS "{c}"')
        elif table == "customer" and c == "c_name":
            parts.append(
                f"format('Customer#{{:09d}}', c_custkey + {i * 15_000}) "
                f'AS "{c}"'
            )
        elif table == "supplier" and c == "s_name":
            parts.append(
                f"format('Supplier#{{:09d}}', s_suppkey + {i * 1_000}) "
                f'AS "{c}"'
            )
        elif table == "documents" and c == "text" and i > 0:
            # distinct per-tile token keeps cross-tile texts near- but
            # not exact-duplicates (within-tile dup structure unchanged)
            parts.append(f"'t{i} ' || text AS \"{c}\"")
        elif table == "documents" and c == "n_chars" and i > 0:
            parts.append(
                f'CAST(length(\'t{i} \' || text) AS INTEGER) AS "{c}"'
            )
        elif table == "embeddings" and c == "embedding" and i > 0:
            # circular dimension rotation: norms and within-tile pairwise
            # cosines preserved exactly; cross-tile cosines decorrelate
            r = 16 * (i % 4)
            if r == 0:
                parts.append(f'"{c}"')
                continue
            parts.append(
                f'embedding[{r + 1}:64] || embedding[1:{r}] AS "{c}"'
            )
        else:
            parts.append(f'"{c}"')
    return "SELECT " + ", ".join(parts) + f" FROM '{SRC}/{table}.parquet'"


def build(out: str, factor: int = 1) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, (base_tiles, strides) in TILED.items():
        tiles = base_tiles * factor
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        body = "\nUNION ALL\n".join(
            _tile_select(t, cols, strides, i) for i in range(tiles)
        )
        con.execute(
            f"COPY ({body}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf{factor}.0 written to {out}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixture_cache", "sf1.0",
    )
    build(out, int(sys.argv[2]) if len(sys.argv) > 2 else 1)
