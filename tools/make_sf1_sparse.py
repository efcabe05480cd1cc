"""Synthesize the SPARSE-pair sf1.0 documents corpus for the
connected-components scaling measurement (VERDICT r6 item 7).

The standard sf1.0 tiler (tools/make_sf1.py) perturbs each tile's text
with a single prefix token — which keeps long documents' 3-shingle
sets ~intact ACROSS tiles, so every near-dup cluster of size s becomes
one 10s-clique-ish cluster and the pair graph densifies 979× in edges.
That is a fine stress fixture but a useless one for measuring whether
components runtime is linear in EDGES: edges themselves exploded
superlinearly in documents.

This variant prefixes EVERY token with a tile marker (``t{i}``) for
tiles i > 0:

* WITHIN a tile, shingle equality is exactly preserved (the prefix is
  a bijective token remap: shingle "x y z" → "t3x t3y t3z"), so each
  tile reproduces sf0.1's near-dup graph verbatim (same edges, same
  components, doc_ids offset);
* ACROSS tiles, no two shingles ever match (different prefixes), so
  cross-tile edges are ZERO by construction.

Result: documents ×10, edges EXACTLY ×10 — the clean fixture for an
edges-vs-time scaling row (recorded in SCALE.md).

Only documents.parquet is written: `dedup_components` (and the whole
`_jaccard_pair_frame` family) reads nothing else.

Usage: PYTHONPATH=. python tools/make_sf1_sparse.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pandas as pd

SRC = "/root/testdata/sf0.1"
TILES = 10
DOC_STRIDE = 5_000  # sf0.1 doc_id key-space size (see tools/make_sf1.py)


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    tiles = []
    for i in range(TILES):
        t = base.copy()
        t["doc_id"] = t["doc_id"] + DOC_STRIDE * i
        if i > 0:
            pref = f"t{i}"
            t["text"] = t["text"].map(
                lambda s, p=pref: " ".join(
                    p + tok for tok in s.split(" ")
                )
                if isinstance(s, str)
                else s
            )
            if "n_chars" in t.columns:
                t["n_chars"] = t["text"].map(
                    lambda s: len(s) if isinstance(s, str) else None
                ).astype(base["n_chars"].dtype)
        tiles.append(t)
    out = pd.concat(tiles, ignore_index=True)
    out.to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False
    )
    print(f"wrote {len(out)} documents → {out_dir}")


if __name__ == "__main__":
    build(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".fixture_cache",
            "sf1_sparse",
        )
    )
