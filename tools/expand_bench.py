"""Expand a compact bench line (bench.py's final stdout line, or the
``parsed`` field of a driver ``BENCH_r*.json``) back into the full named
per-query timing map.

The compact line carries timings as ``qvals``, aligned index-for-index
with ``sorted(set(registered queries) - set(qerr))`` — the names are
deterministic from the registry, so the map reconstructs exactly.

Usage:
    PYTHONPATH=. python tools/expand_bench.py BENCH_r06.json
    PYTHONPATH=. python tools/expand_bench.py '{"qvals": [...], ...}'
"""

from __future__ import annotations

import json
import sys


def expand(compact: dict, names: list[str] | None = None) -> dict[str, float]:
    """Rebuild ``{query_name: seconds}`` from a compact bench record."""
    if "queries" in compact and isinstance(compact["queries"], dict):
        return compact["queries"]  # already a named map (verbose form)
    if names is None:
        from kinesis_handler_spark.registry import all_queries

        names = list(all_queries())
    errs = set(compact.get("qerr", []))
    timed = sorted(n for n in names if n not in errs)
    qvals = compact["qvals"]
    if len(timed) != len(qvals):
        raise ValueError(
            f"alignment mismatch: {len(timed)} timed names vs "
            f"{len(qvals)} qvals — registry changed since this bench ran?"
        )
    # qfp catches EQUAL-count divergence (rename, or one query added
    # while another was removed), which zip() would silently misalign.
    if "qfp" in compact:
        import hashlib

        fp = hashlib.sha256(",".join(timed).encode()).hexdigest()[:8]
        if fp != compact["qfp"]:
            raise ValueError(
                f"name-list fingerprint mismatch: artifact qfp="
                f"{compact['qfp']}, current registry gives {fp} — the "
                "registry's query names changed since this bench ran"
            )
    return dict(zip(timed, qvals))


def main() -> None:
    arg = sys.argv[1]
    if arg.lstrip().startswith("{"):
        rec = json.loads(arg)
    else:
        with open(arg) as fh:
            rec = json.load(fh)
        # driver artifact wraps the parsed line under "parsed"
        if "parsed" in rec and isinstance(rec["parsed"], dict):
            rec = rec["parsed"]
    full = expand(rec)
    print(json.dumps(full, indent=1, sort_keys=True))
    print(f"# {len(full)} queries, total {sum(full.values()):.1f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
