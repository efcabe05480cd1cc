"""Time one or more declared queries in isolation (guide §1.4) and
optionally dump their formatted physical plans.

    PYTHONPATH=. python tools/time_query.py q1 q2 ... [--runs N]
        [--plans plans/r12 --suffix before] [--sf DIR]

Methodology matches bench.py exactly: noop sink, min-of-N, warm JVM +
Python worker pool first, job descriptions set per query so the UI and
event logs attribute stages correctly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kinesis_handler_spark.registry import all_queries  # noqa: E402
from kinesis_handler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for .explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # Same warm-up as bench.py: JVM/parquet footers + Arrow worker pool.
    qs["agg_groupby_pricing"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        df = qs[name](spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            jvm = spark.sparkContext._jvm
            txt = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as fh:
                fh.write(txt)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f}s "
            f"runs={[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
