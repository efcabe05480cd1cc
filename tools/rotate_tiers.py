"""Suggest next round's driver-check priority order (registry tiers).

The external driver hash-checks only the FIRST 50 entries of
``queries()``; with more than 50 oracle-backed queries, verification
must rotate across rounds.  This tool reads every ``CORRECTNESS_r*.json``
in the repo root and prints, for each registered query, its verdict
history and the round it last went green — then a suggested front-50
ordering for the next round:

1. oracle-backed queries with NO green verdict in any round
   (new / unchecked / still-red), registration order;
2. oracle-backed queries by last-green round ASCENDING (stalest first);
3. rows-only queries last (no hash verdict either way).

Paste the cut at 50 into ``registry._FRONT`` at round start — or pass
``--write`` to rewrite the ``_FRONT = [...]`` block in registry.py in
place (round 3 was lost partly because the rotation was never applied;
--write makes it one command: rotate, run pytest, commit).

Usage: PYTHONPATH=. python tools/rotate_tiers.py [--write]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

from kinesis_handler_spark.registry import QUERIES, all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verdict_history() -> dict[str, dict[int, bool]]:
    hist: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            green = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            hist.setdefault(name, {})[rnd] = green
    return hist


def suggested_order() -> tuple[list[str], dict[str, str]]:
    hist = verdict_history()
    names = list(all_queries())  # current driver order
    oracle = {n for n, q in QUERIES.items() if q.oracle is not None}

    def last_green(n: str) -> int:
        rounds = [r for r, ok in hist.get(n, {}).items() if ok]
        return max(rounds) if rounds else -1

    never = [n for n in names if n in oracle and last_green(n) < 0]
    green = sorted(
        (n for n in names if n in oracle and last_green(n) >= 0),
        key=lambda n: (last_green(n), names.index(n)),
    )
    rows_only = [n for n in names if n not in oracle]
    tags = {}
    for n in names:
        lg = last_green(n)
        tags[n] = ("rows-only" if n not in oracle
                   else f"last green r{lg}" if lg >= 0 else "NEVER GREEN")
    print(f"# {len(names)} queries: {len(never)} never-green oracle, "
          f"{len(green)} green at least once, {len(rows_only)} rows-only")
    return never + green + rows_only, tags


def write_front(order: list[str], tags: dict[str, str], cap: int = 50) -> None:
    """Rewrite registry.py's ``_FRONT = [...]`` block with the first
    ``cap`` suggested names (rows-only excluded — they carry no hash
    verdict and must never consume a verdict slot)."""
    front = [n for n in order if tags[n] != "rows-only"][:cap]
    path = os.path.join(_REPO, "kinesis_handler_spark", "registry.py")
    with open(path) as fh:
        src = fh.read()
    start = src.index("_FRONT = [")
    end = src.index("]", start) + 1
    lines = ["_FRONT = ["]
    for n in front:
        lines.append(f'    "{n}",  # {tags[n]}')
    lines.append("]")
    with open(path, "w") as fh:
        fh.write(src[:start] + "\n".join(lines) + src[end:])
    print(f"wrote {len(front)} names to registry._FRONT ({path})")


def main() -> None:
    order, tags = suggested_order()
    for i, n in enumerate(order, 1):
        marker = " <-- cap" if i == 50 else ""
        print(f"{i:3d}. {n:28s} {tags[n]}{marker}")
    if "--write" in sys.argv[1:]:
        write_front(order, tags)


if __name__ == "__main__":
    main()
