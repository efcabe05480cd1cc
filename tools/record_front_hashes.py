"""Record per-query source fingerprints at their last driver check.

Maintains ``tests/front_source_hashes.json``: for every oracle-backed
query, the sha256 of its function source + oracle SQL as of the last
round the driver hash-checked it green, plus that round number.  The
guard test (tests/test_registry_front.py) diffs each query's CURRENT
fingerprint against this record and forces any changed-since-checked
query into the next ``_FRONT`` — closing the r9 gap where a query
rewritten after its last check kept a stale green verdict until
rotation happened to reach it.

RUN THIS AT ROUND START, BEFORE EDITING ANY QUERY (alongside
``tools/rotate_tiers.py --write``): at that moment the working tree is
the round-close commit the driver just checked, so "current
fingerprint" == "fingerprint at check time" for every query that went
green in the latest CORRECTNESS file.  The tool:

1. keeps the existing record for queries not checked in the latest
   round (their last-check state is older than the working tree);
2. updates sha + round for queries green in the latest round;
3. drops queries that no longer exist.

Usage: PYTHONPATH=. python tools/record_front_hashes.py [--out PATH]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

from kinesis_handler_spark.registry import (
    QUERIES,
    all_queries,
    source_fingerprint,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_REPO, "tests", "front_source_hashes.json")


def _verdict_history() -> dict[str, dict[int, bool]]:
    spec = importlib.util.spec_from_file_location(
        "rotate_tiers", os.path.join(os.path.dirname(__file__),
                                     "rotate_tiers.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.verdict_history()


def main() -> None:
    out_path = _OUT
    if "--out" in sys.argv[1:]:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    all_queries()  # registration side effect
    hist = _verdict_history()
    latest_round = max((r for h in hist.values() for r in h), default=0)

    existing: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)

    record: dict[str, dict] = {}
    n_new, n_updated = 0, 0
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue  # rows-only: no hash verdict to go stale
        greens = [r for r, ok in hist.get(name, {}).items() if ok]
        if not greens:
            continue  # never checked green: the never-green rule fronts it
        last_green = max(greens)
        prev = existing.get(name)
        if prev is None or last_green >= latest_round or (
            last_green > prev.get("checked_round", -1)
        ):
            sha = source_fingerprint(name)
            if prev is None:
                n_new += 1
            elif prev["sha"] != sha or prev["checked_round"] != last_green:
                n_updated += 1
            record[name] = {"sha": sha, "checked_round": last_green}
        else:
            record[name] = prev
    with open(out_path, "w") as fh:
        json.dump(dict(sorted(record.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"recorded {len(record)} fingerprints -> {out_path} "
        f"({n_new} new, {n_updated} updated, latest round r{latest_round})"
    )


if __name__ == "__main__":
    main()
