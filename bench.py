"""Per-round benchmark: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Execution is forced with a noop datasource write (full pipeline runs,
nothing collected to the driver) — the honest way to time a distributed
plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from kinesis_handler_spark.registry import all_queries  # noqa: E402
from kinesis_handler_spark.session import get_spark  # noqa: E402


def run_bench(sf_dir: str) -> dict:
    spark = get_spark("kinesis-handler-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # Warm the JVM + parquet footer caches with the flagship query so
    # per-query numbers measure the plan, not first-run JIT.
    try:
        qs["agg_groupby_pricing"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001 - warm-up only; real run is isolated below
        pass
    # Warm the Python/Arrow worker pool too — otherwise the first
    # pandas-UDF query is charged ~6 s of one-time worker spin-up.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()
    # min of N runs per query: measures the plan, not GC/scheduler noise
    # (single-run totals on this box swing ±30%, heavy queries ±2×).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(qs):
        # Per-query isolation: one broken query must never zero the whole
        # round's perf artifact — record its error and keep timing the rest.
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 - per-query fault boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        timings[name] = round(best, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_declared_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
        out["error_count"] = len(errors)
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = run_bench(sf_dir)
    # Persist the full artifact locally: the driver captures only the tail
    # of stdout, which truncated round 4's record at 73/126 queries. The
    # repo copy is the durable per-query baseline.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(_REPO_DIR, "BENCH_LOCAL.json")
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # stdout line below is still the primary contract
    print(json.dumps(result))
