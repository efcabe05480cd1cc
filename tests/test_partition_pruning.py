"""Partition pruning: a partitioned parquet layout + a partition-key
filter must prune at planning time (PartitionFilters), not scan-filter.
This is the 100 TB lever the engine's sinks rely on (routed channels
partitioned by schema; date-partitioned fact tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_handler_spark.tables import table


def test_partition_filter_prunes_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = table(spark, sf_dir, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (planning-time file
    # pruning), not in PushedFilters/post-scan Filter over all files
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_type" in pf
    # values survive the partitioned round-trip
    expect = events.filter(F.col("event_type") == "click").count()
    assert back.count() == expect
    # and only the one partition directory is read
    files = [
        r.filePath
        for r in back.select(F.input_file_name().alias("filePath")).distinct().collect()
    ]
    assert files and all("event_type=click" in f for f in files)


def test_dynamic_partition_overwrite_replaces_only_touched(spark, sf_dir, tmp_path):
    out = str(tmp_path / "dyn")
    events = table(spark, sf_dir, "events").select("event_id", "event_type")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)
    n_click = spark.read.parquet(out).filter("event_type = 'click'").count()
    n_total = spark.read.parquet(out).count()

    # dynamic mode: overwriting ONLY the 'error' partition must leave
    # every other partition intact (idempotent-channel-sink semantics)
    repl = spark.createDataFrame([(10**9, "error")], "event_id long, event_type string")
    (
        repl.write.partitionBy("event_type")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(out)
    )
    after = spark.read.parquet(out)
    assert after.filter("event_type = 'error'").count() == 1
    assert after.filter("event_type = 'click'").count() == n_click
    n_untouched = events.filter("event_type <> 'error'").count()
    assert after.filter("event_type <> 'error'").count() == n_untouched
    assert after.count() == n_untouched + 1
    assert n_untouched < n_total  # the replaced partition was non-empty


def test_source_partitioned_scan_prunes_to_one_year(spark, sf_dir):
    # the declared query's ship_year=1996 predicate must be a
    # planning-time PartitionFilter over the hive layout it writes
    from kinesis_handler_spark.registry import all_queries

    df = all_queries()["source_partitioned_scan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "ship_year" in pf and "1996" in pf
    # row counts agree with the same predicate over the unpartitioned
    # original (the partitioned rewrite lost/duplicated nothing)
    n = df.agg(F.sum("n").cast("long").alias("t")).collect()[0]["t"]
    expect = (
        table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1996)
        .count()
    )
    assert n == expect
