"""Pin golden output hashes for ALL rows-only queries.

The 14 rows-only operators (no SQL oracle can exist — engine-hash /
sketch / iterative algorithms) are nonetheless all bit-stable for a
fixed dataset: the hash seeds are constants, sketch merges are
order-insensitive (HLL) or partition-deterministic (GK), ANN ties
break on ids, and the iterative solves (PCA eigens, BPE merges) carry
total tie-breaks.  Measured: two independent Spark sessions produce
identical sha256 for every one of the 13 (r8; the four
bit-stable-by-construction ones were pinned first per r7 verdict item
3, then the probe showed the rest hold too).

The driver records these as ``no_oracle`` forever ("ran, rows > 0").
This tool upgrades that to "returned the pinned bits": it runs each
query at sf0.01, canonicalizes the output exactly like the strict
oracle gate (sorted column names + order-insensitive multiset of
type-strict rendered rows — ``tools/check_oracle``'s ``_normalize``),
and writes sha256 hashes to ``tests/golden_hashes.json``.
``tests/test_golden_artifacts.py`` recomputes the hash on every suite
run and compares.

Scope note: sketch-merge determinism is tied to the session shape the
suite uses (``get_spark(cpus=8, shuffle_partitions=8)``) — the gate
runs under exactly that config, so the pin is well-defined; a config
change that legitimately re-partitions a sketch merge shows up as an
explicit ``--write`` diff, not silence.

The hashes change ONLY via this tool (an intentional algorithm change
reruns ``--write`` and the diff shows up in review); the pytest gate
failing means the operator's bits drifted unintentionally.

Usage: PYTHONPATH=. python tools/make_golden.py [--write] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

from tools.check_oracle import _rows_to_multiset

def golden_queries() -> tuple[str, ...]:
    """EVERY rows-only query, straight from the registry — a hardcoded
    list silently skipped ``dedup_incremental_minhash`` in r10 until the
    completeness test caught it, so the enumeration is now derived.
    Every rows-only operator must be bit-stable for a fixed dataset
    (hash seeds are constants, sketch merges order-insensitive or
    partition-deterministic, iterative solves carry total tie-breaks) —
    a new rows-only query that is NOT bit-stable will fail the pin gate
    immediately, which is the correct pressure."""
    from kinesis_handler_spark.registry import QUERIES, all_queries

    all_queries()  # registration side effect
    return tuple(n for n, q in QUERIES.items() if q.oracle is None)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_PATH = os.path.join(_REPO, "tests", "golden_hashes.json")
DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def golden_record(spark, name: str, sf_dir: str) -> dict:
    """Run one query and produce its canonical golden record."""
    from kinesis_handler_spark.registry import all_queries

    sdf = all_queries()[name](spark, sf_dir)
    cols = sdf.columns
    rows = [tuple(r) for r in sdf.collect()]
    order = [cols.index(c) for c in sorted(cols)]
    ms = _rows_to_multiset(rows, order)
    digest = hashlib.sha256(
        ("\n".join(sorted(cols)) + "\n---\n" + "\n".join(ms)).encode()
    ).hexdigest()
    return {"columns": sorted(cols), "rows": len(rows), "sha256": digest}


def main() -> int:
    write = "--write" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--write"]
    sf_dir = args[0] if args else DEFAULT_SF_DIR
    from kinesis_handler_spark.session import get_spark

    spark = get_spark("golden-pin", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    current = {}
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as fh:
            current = json.load(fh).get("queries", {})
    out = {}
    for name in golden_queries():
        rec = golden_record(spark, name, sf_dir)
        old = current.get(name, {}).get("sha256")
        status = (
            "NEW" if old is None
            else "unchanged" if old == rec["sha256"]
            else "CHANGED"
        )
        print(f"{name:22s} rows={rec['rows']:5d} {rec['sha256'][:16]}… "
              f"[{status}]")
        out[name] = rec
    if write:
        with open(GOLDEN_PATH, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1,
                      sort_keys=True)
            fh.write("\n")
        print(f"wrote {GOLDEN_PATH}")
    else:
        print("(dry run — pass --write to pin)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
