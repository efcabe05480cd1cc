"""Growth-exponent probe past sf1.0 (VERDICT r8 item 3).

Times the five sf1.0-heaviest operators at sf0.1 / sf1.0 / sf3.0 in
ONE session (same JVM, same warm caches — cross-session readings on
this host drift 25-40%) and fits the per-step growth exponent
``log(t_hi/t_lo) / log(sf_hi/sf_lo)``.  Exponent < 2 on the 1->3 step
means sub-quadratic growth where it counts: past the scale the r8
probe covered.  min-of-2 per (query, sf) — single-run sf1+ readings
swing wildly (round-8 gotcha).

Usage: PYTHONPATH=. python tools/growth_probe.py [out_json]
Needs .fixture_cache/sf1.0 (tools/make_sf1.py) and .fixture_cache/sf3.0
(tools/make_sf1.py .fixture_cache/sf3.0 3).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kinesis_handler_spark.registry import all_queries  # noqa: E402
from kinesis_handler_spark.session import get_spark  # noqa: E402

PROBE = [
    "graph_triangle_count",
    "graph_pagerank",
    "dedup_span_trim",
    "dedup_simhash",
    "dedup_span_exact",
]
SFS = [
    (0.1, "/root/testdata/sf0.1"),
    (1.0, os.path.join(_REPO, ".fixture_cache", "sf1.0")),
    (3.0, os.path.join(_REPO, ".fixture_cache", "sf3.0")),
]
RUNS = 2


def main(out_path: str | None) -> None:
    spark = get_spark("growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warm JVM + python worker pool once
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()
    timings: dict[str, dict[float, float]] = {n: {} for n in PROBE}
    for sf, d in SFS:
        for name in PROBE:
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name][sf] = round(best, 2)
            print(f"sf{sf} {name}: {best:.2f}s", flush=True)
    result = {}
    for name, t in timings.items():
        e01 = math.log(t[1.0] / t[0.1]) / math.log(10)
        e13 = math.log(t[3.0] / t[1.0]) / math.log(3)
        result[name] = {
            "sec": {str(k): v for k, v in t.items()},
            "exp_0.1_to_1": round(e01, 2),
            "exp_1_to_3": round(e13, 2),
        }
        print(f"{name}: exponents 0.1->1 = {e01:.2f}, 1->3 = {e13:.2f}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
