"""Run every declared query under a VANILLA SparkSession.

The external driver builds its own bare ``SparkSession`` with none of
``session.py``'s engine confs (UTC timezone, nanosAsLong, AQE, Arrow,
16g heap).  Rounds 2-3 proved that environment drift between our
configured session and the driver's vanilla one (the TIMESTAMP_NTZ
fixture change) can break queries that are green locally.  This sweep
reproduces the driver's environment — and goes one step harsher by
pinning a NON-UTC session timezone — so drift is caught locally first.

Checks per query: the DataFrame builds (analysis succeeds) and executes
(noop write).  Plus one value check: ``unix_micros(events.ts)`` must be
bit-identical to DuckDB's ``epoch_us`` on the same parquet, proving the
timestamp normalization in ``tables.table`` is session-TZ-independent.

Prints ONE JSON line: {"failures": {...}, "checked": N, "ts_ok": bool}.
Exit code 0 iff no failures and the value check passed.

Usage: python tools/vanilla_sweep.py [sf_dir]
Run from a FRESH process — an already-configured JVM in the same
process would defeat the point.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # Deliberately NOT get_spark(): bare session, hostile timezone.
    spark = (
        SparkSession.builder.appName("khs-vanilla-sweep")
        .master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kinesis_handler_spark.registry import all_queries
    from kinesis_handler_spark.tables import table

    failures: dict[str, str] = {}

    # NOTE on hostile-TZ coverage: reading the events table pins the
    # session timezone to UTC (tables.table wall-clock layer), so the
    # hostile zone is RE-ASSERTED before every query — otherwise the
    # first events reader would neutralize the sweep for everything
    # after it.
    hostile_tz = "America/New_York"

    qs = all_queries()
    for name, fn in qs.items():
        try:
            spark.conf.set("spark.sql.session.timeZone", hostile_tz)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 - per-query fault boundary
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]

    # Value check runs UNDER hostile timezones: the column-local
    # normalization must be TZ-independent and match DuckDB exactly.
    # Two zones on purpose — a whole-hour offset (DST-bearing) and a
    # HALF-hour offset, which catches any normalization that is
    # accidentally correct only modulo whole hours.
    ts_ok = False
    try:
        import duckdb

        duck_us = [
            r[0]
            for r in duckdb.sql(
                "SELECT epoch_us(ts) FROM read_parquet("
                f"'{sf_dir}/events.parquet') ORDER BY event_id LIMIT 3"
            ).fetchall()
        ]
        # wall-clock reference: DuckDB's naive-timestamp date buckets
        duck_days = dict(
            duckdb.sql(
                "SELECT CAST(ts AS DATE), COUNT(*) FROM read_parquet("
                f"'{sf_dir}/events.parquet') GROUP BY 1"
            ).fetchall()
        )
        ts_ok = True
        for tz in (hostile_tz, "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            ev = table(spark, sf_dir, "events")
            got = (
                ev.orderBy("event_id")
                .select(F.unix_micros("ts").alias("us"))
                .limit(3)
                .collect()
            )
            spark_us = [r["us"] for r in got]
            if spark_us != duck_us:
                ts_ok = False
                failures["__ts_value__"] = (
                    f"tz={tz} spark={spark_us} duckdb={duck_us}"
                )
            # WALL-CLOCK layer: to_date buckets must match DuckDB too —
            # this is the check that catches a removed UTC pin even
            # when the instants themselves are exact (review finding,
            # round 5: to_date shifted a day under America/New_York).
            spark.conf.set("spark.sql.session.timeZone", tz)
            ev2 = table(spark, sf_dir, "events")
            spark_days = {
                r["d"]: r["n"]
                for r in ev2.groupBy(F.to_date("ts").alias("d"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            if spark_days != duck_days:
                ts_ok = False
                diff = {
                    k: (spark_days.get(k), duck_days.get(k))
                    for k in set(spark_days) ^ set(duck_days)
                } or "count mismatch"
                failures["__ts_wallclock__"] = f"tz={tz} {diff}"[:300]
            # Orders wall-clock too: o_orderdate is ALSO timestamp-no-tz,
            # and date_trunc coerces NTZ through the session zone — the
            # round-5 review repro'd a +04:00 shift on scalar_date when
            # only events was pinned.  This check fails if table()'s UTC
            # pin ever stops covering non-events tables.
            spark.conf.set("spark.sql.session.timeZone", tz)
            om = table(spark, sf_dir, "orders")
            # normalize to YYYY-MM-DD: DuckDB's date_trunc returns DATE
            # while Spark returns TIMESTAMP at midnight — same instant,
            # different repr.  A TZ shift moves the DATE itself, which
            # is what this check watches.
            spark_months = {
                str(r["m"])[:10]: r["n"]
                for r in om.groupBy(
                    F.date_trunc("month", "o_orderdate").alias("m")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            duck_months = {
                str(k)[:10]: v
                for k, v in duckdb.sql(
                    "SELECT date_trunc('month', o_orderdate), COUNT(*) "
                    f"FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1"
                ).fetchall()
            }
            if spark_months != duck_months:
                ts_ok = False
                failures["__orders_wallclock__"] = (
                    f"tz={tz} spark={sorted(spark_months)[:2]} "
                    f"duck={sorted(duck_months)[:2]}"
                )[:300]
    except Exception as exc:  # noqa: BLE001
        failures["__ts_value__"] = f"{type(exc).__name__}: {exc}"[:300]

    print(json.dumps({
        "failures": failures,
        "checked": len(qs),
        "ts_ok": ts_ok,
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")))
