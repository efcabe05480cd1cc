"""Streaming stateful operator tests: windows, watermark late-data drop,
streaming dedup, applyInPandasWithState (SURVEY.md §2.B streaming table).

Strategy: batch-mode runs assert exact VALUES (unified semantics);
streaming runs over file sources with maxFilesPerTrigger=1 assert the
BEHAVIOR only streaming has — watermark drops, cross-batch state,
bounded dedup."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kinesis_handler_spark.streaming import (
    session_aggregate,
    sliding_aggregate,
    stateful_running_totals,
    stream_dedup,
    tumbling_aggregate,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ev(eid, ts, uid=1, etype="click", value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": uid, "event_type": etype, "value": value}


def _write(path, rows, mtime: float | None = None):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    if mtime is not None:
        # File-source micro-batch order follows modification time; ties
        # are broken arbitrarily — pin distinct mtimes when a test
        # depends on batch order (e.g. watermark progression).
        import os

        os.utime(path, (mtime, mtime))


def _batch_df(spark, rows):
    return spark.read.schema(EVENTS_SCHEMA).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )


# -- batch-mode value checks -------------------------------------------------

def test_tumbling_values_batch(spark):
    rows = [
        _ev(1, "2024-01-01T00:01:00", etype="click", value=2.5),
        _ev(2, "2024-01-01T00:04:00", etype="click", value=1.5),
        _ev(3, "2024-01-01T00:11:00", etype="click", value=4.0),
        _ev(4, "2024-01-01T00:03:00", etype="view", value=1.0),
    ]
    out = {
        (str(r["win_start"]), r["event_type"]): (r["n"], float(r["total"]))
        for r in tumbling_aggregate(_batch_df(spark, rows)).collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == (2, 4.0)
    assert out[("2024-01-01 00:10:00", "click")] == (1, 4.0)
    assert out[("2024-01-01 00:00:00", "view")] == (1, 1.0)


def test_sliding_windows_overlap_batch(spark):
    rows = [_ev(1, "2024-01-01T00:07:00")]
    wins = sorted(
        str(r["win_start"])
        for r in sliding_aggregate(_batch_df(spark, rows)).collect()
    )
    # a row at :07 falls in the [:00,:10) and [:05,:15) sliding windows
    assert wins == ["2024-01-01 00:00:00", "2024-01-01 00:05:00"]


def test_session_window_gap_batch(spark):
    rows = [
        _ev(1, "2024-01-01T00:00:00", uid=7),
        _ev(2, "2024-01-01T00:10:00", uid=7),   # same session (gap 30m)
        _ev(3, "2024-01-01T01:30:00", uid=7),   # new session
        _ev(4, "2024-01-01T00:00:00", uid=8),
    ]
    out = session_aggregate(_batch_df(spark, rows)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[7]) == [1, 2]
    assert by_user[8] == [1]


# -- streaming behavior ------------------------------------------------------

def test_watermark_drops_late_rows_streaming(spark, tmp_path):
    # The watermark is checkpointed: sequential availableNow runs over a
    # shared checkpoint advance it deterministically (a single run may
    # fold all files into one micro-batch, where the watermark never
    # advances mid-run and nothing is late).
    src = tmp_path / "src"
    src.mkdir()

    out_dir = str(tmp_path / "out")

    def run(name: str) -> None:
        # parquet append sink: supports checkpoint recovery (memory sink
        # does not) and accumulates finalized windows across runs.
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
        q = (
            tumbling_aggregate(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # Whether a window's finalized row is emitted at the end of the run
    # that advanced the watermark or at the start of the next run is a
    # timing detail; what is DETERMINISTIC is the union of emissions:
    # each finalized (window, count) appears exactly once across runs.

    # run 1: events up to 00:30 checkpoint a watermark of 00:20 —
    # closing window [00:00,00:10) with only event 1.
    _write(src / "b0.json", [
        _ev(1, "2024-01-01T00:05:00"),
        _ev(2, "2024-01-01T00:30:00"),
    ])
    run("wm_run1")
    # run 2: processed under watermark 00:20 — the far-late row 99
    # (00:02) must be DROPPED, not merged into the closing window.
    _write(src / "b1.json", [
        _ev(3, "2024-01-01T00:31:00"),
        _ev(99, "2024-01-01T00:02:00"),
    ])
    # runs 3+4: far-future events advance the watermark past 00:40 so
    # [00:30,00:40) finalizes with events 2 and 3 (state carried across
    # checkpointed restarts).
    run("wm_run2")
    _write(src / "b2.json", [_ev(4, "2024-01-01T03:00:00")])
    run("wm_run3")
    _write(src / "b3.json", [_ev(5, "2024-01-01T04:00:00")])
    run("wm_run4")

    emissions = {
        (str(r["win_start"]), r["n"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("2024-01-01 00:00:00", 1) in emissions, emissions   # 99 dropped
    assert ("2024-01-01 00:00:00", 2) not in emissions, emissions
    assert ("2024-01-01 00:30:00", 2) in emissions, emissions   # state kept


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [
        _ev(1, "2024-01-01T00:01:00"),
        _ev(1, "2024-01-01T00:01:30"),  # duplicate within batch
        _ev(2, "2024-01-01T00:02:00"),
    ])
    _write(src / "b1.json", [
        _ev(1, "2024-01-01T00:03:00"),  # duplicate across batches
        _ev(3, "2024-01-01T00:04:00"),
    ])
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_dedup(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ids = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_stream").collect()
    )
    assert ids == [1, 2, 3]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [
        _ev(1, "2024-01-01T00:01:00", uid=1, value=10.0),
        _ev(2, "2024-01-01T00:02:00", uid=1, value=5.0),
        _ev(3, "2024-01-01T00:02:30", uid=2, value=1.0),
    ])
    _write(src / "b1.json", [
        _ev(4, "2024-01-01T00:05:00", uid=1, value=2.0),
    ])
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM running_totals ORDER BY user_id, n_events"
    ).collect()
    got = [(r["user_id"], r["n_events"], r["total_value"]) for r in rows]
    # Micro-batch file order is not guaranteed; what must hold: user 1
    # is emitted once per batch with state ACCUMULATING to (3, 17.0),
    # proving state carried across micro-batches.
    user1 = [(n, t) for (u, n, t) in got if u == 1]
    assert len(user1) == 2, got
    assert user1[-1] == (3, 17.0), got
    assert user1[0][0] < 3, got
    assert (2, 1, 1.0) in got


def test_transform_with_state_accumulates_across_batches(spark, tmp_path):
    # transformWithStateInPandas runs a protobuf-based Python driver
    # worker; the protobuf package is not installed in this container,
    # so the operator is exercised only where the dependency exists.
    pytest.importorskip("google.protobuf")
    from kinesis_handler_spark.streaming import stateful_user_stats_tws

    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [
        _ev(1, "2024-01-01T00:01:00", uid=1, value=10.0),
        _ev(2, "2024-01-01T00:02:00", uid=1, value=5.0),
        _ev(3, "2024-01-01T00:02:30", uid=2, value=1.0),
    ], mtime=1_700_000_000)
    _write(src / "b1.json", [
        _ev(4, "2024-01-01T00:05:00", uid=1, value=2.0),
    ], mtime=1_700_000_100)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stateful_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM tws_stats ORDER BY user_id, n_events"
    ).collect()
    got = [
        (r["user_id"], r["first_us"], r["last_us"], r["n_events"], r["total_value"])
        for r in rows
    ]
    user1 = [g for g in got if g[0] == 1]
    # state accumulated across micro-batches: final emit covers all 3
    # user-1 events with first/last spanning both batches
    assert len(user1) == 2, got
    t0 = 1_704_067_260_000_000  # 2024-01-01T00:01:00 UTC in µs
    assert user1[-1] == (1, t0, t0 + 240_000_000, 3, 17.0), got
    assert (2, t0 + 90_000_000, t0 + 90_000_000, 1, 1.0) in got


# -- stream-stream interval join ---------------------------------------------

IMPR_SCHEMA = "imp_id long, ts timestamp, user_id long"
CLICK_SCHEMA = "click_id long, ts timestamp, user_id long"


def test_stream_stream_join_batch_values(spark):
    from kinesis_handler_spark.streaming import stream_stream_interval_join

    imps = spark.read.schema(IMPR_SCHEMA).json(
        spark.sparkContext.parallelize([
            json.dumps({"imp_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 7}),
            json.dumps({"imp_id": 2, "ts": "2024-01-01T11:00:00", "user_id": 7}),
            json.dumps({"imp_id": 3, "ts": "2024-01-01T10:00:00", "user_id": 9}),
        ])
    )
    clicks = spark.read.schema(CLICK_SCHEMA).json(
        spark.sparkContext.parallelize([
            # within 10 min of imp 1, same user -> match
            json.dumps({"click_id": 10, "ts": "2024-01-01T10:05:00", "user_id": 7}),
            # 20 min after imp 1 -> outside the interval
            json.dumps({"click_id": 11, "ts": "2024-01-01T10:20:00", "user_id": 7}),
            # right user, before the impression -> no match
            json.dumps({"click_id": 12, "ts": "2024-01-01T09:59:00", "user_id": 9}),
        ])
    )
    out = stream_stream_interval_join(
        imps, clicks, "user_id", interval_seconds=600
    ).select("l.imp_id", "r.click_id")
    assert [(r["imp_id"], r["click_id"]) for r in out.collect()] == [(1, 10)]


def test_stream_stream_join_streaming(spark, tmp_path):
    # the real thing: two file-source streams joined with bounded state
    from kinesis_handler_spark.streaming import stream_stream_interval_join

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(); rsrc.mkdir()
    _write(lsrc / "a.json", [
        {"imp_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 7},
        {"imp_id": 3, "ts": "2024-01-01T10:00:00", "user_id": 9},
    ])
    _write(rsrc / "a.json", [
        {"click_id": 10, "ts": "2024-01-01T10:05:00", "user_id": 7},
        {"click_id": 11, "ts": "2024-01-01T10:20:00", "user_id": 7},
    ])
    left = spark.readStream.schema(IMPR_SCHEMA).json(str(lsrc))
    right = spark.readStream.schema(CLICK_SCHEMA).json(str(rsrc))
    out = stream_stream_interval_join(
        left, right, "user_id", interval_seconds=600
    ).select("l.imp_id", "r.click_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ssj").collect()
    assert [(r["imp_id"], r["click_id"]) for r in rows] == [(1, 10)]


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    # left-outer variant: an impression with NO click must surface with
    # null click columns — but only once BOTH watermarks pass the end of
    # its join interval (before that, a match could still arrive and the
    # state store must hold the row).  A second file per side advances
    # event time by 2 h, so the first batch's unmatched row flushes.
    from kinesis_handler_spark.streaming import stream_stream_interval_join

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(); rsrc.mkdir()
    _write(lsrc / "a.json", [
        {"imp_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 7},
        {"imp_id": 3, "ts": "2024-01-01T10:00:00", "user_id": 9},  # never clicked
    ], mtime=1_000)
    _write(rsrc / "a.json", [
        {"click_id": 10, "ts": "2024-01-01T10:05:00", "user_id": 7},
    ], mtime=1_000)
    # watermark advancers (2 h later; their own match keeps them out of
    # the assertion window)
    _write(lsrc / "b.json", [
        {"imp_id": 99, "ts": "2024-01-01T12:00:00", "user_id": 1},
    ], mtime=2_000)
    _write(rsrc / "b.json", [
        {"click_id": 99, "ts": "2024-01-01T12:00:00", "user_id": 1},
    ], mtime=2_000)
    left = (
        spark.readStream.schema(IMPR_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(lsrc))
    )
    right = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(rsrc))
    )
    out = stream_stream_interval_join(
        left, right, "user_id", interval_seconds=600, how="left_outer"
    ).select("l.imp_id", "r.click_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["imp_id"], r["click_id"])
        for r in spark.sql("select * from ssj_outer").collect()
    }
    assert (1, 10) in rows          # matched pair
    assert (3, None) in rows        # unmatched left row, null-extended
    assert (3, 11) not in rows


# -- stream-static join ------------------------------------------------------

def _dim_df(spark):
    return spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )


def test_stream_static_enrich_batch_values(spark):
    from kinesis_handler_spark.streaming import stream_static_enrich

    events = _batch_df(spark, [
        _ev(1, "2024-01-01T00:01:00", uid=1),
        _ev(2, "2024-01-01T00:02:00", uid=2),
        _ev(3, "2024-01-01T00:03:00", uid=7),   # no dim row
    ])
    out = stream_static_enrich(events, _dim_df(spark), "user_id").select(
        "event_id", "tier"
    )
    got = {(r["event_id"], r["tier"]) for r in out.collect()}
    assert got == {(1, "gold"), (2, "silver"), (3, None)}
    # the default path must be a broadcast join: no shuffle of the stream
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stream_static_enrich_streaming(spark, tmp_path):
    from kinesis_handler_spark.streaming import stream_static_enrich

    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [
        _ev(1, "2024-01-01T00:01:00", uid=1),
        _ev(2, "2024-01-01T00:02:00", uid=2),
    ])
    _write(src / "b1.json", [_ev(3, "2024-01-01T00:03:00", uid=7)])
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    out_dir = str(tmp_path / "out")
    q = (
        stream_static_enrich(stream, _dim_df(spark), "user_id")
        .select("event_id", "user_id", "tier")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["event_id"], r["tier"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "gold"), (2, "silver"), (3, None)}


def test_stateful_heavy_hitters_across_batches(spark, tmp_path):
    # Skewed stream: 'hot' dominates across two micro-batches drowned
    # in distinct noise tokens; capacity is far below the distinct
    # count, so state stays bounded while the hot token must survive
    # with its MG lower-bound count.
    from kinesis_handler_spark.streaming import stateful_heavy_hitters

    src = tmp_path / "hh_src"
    src.mkdir()
    b0 = [_ev(i, "2024-01-01T00:01:00", etype="hot") for i in range(30)] + [
        _ev(100 + i, "2024-01-01T00:01:30", etype=f"noise{i}") for i in range(40)
    ]
    b1 = [_ev(200 + i, "2024-01-01T00:02:00", etype="hot") for i in range(25)] + [
        _ev(300 + i, "2024-01-01T00:02:30", etype=f"late{i}") for i in range(40)
    ]
    _write(src / "b0.json", b0, mtime=1_700_000_000)
    _write(src / "b1.json", b1, mtime=1_700_000_100)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    cap = 16
    q = (
        stateful_heavy_hitters(stream, n_buckets=4, capacity=cap)
        .writeStream.format("memory")
        .queryName("stream_hh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM stream_hh").collect()
    # Last emission for 'hot' carries the full cross-batch MG count:
    # within [true - n_bucket/(cap+1), true] where true = 55 and the
    # hot token's bucket saw at most all 135 events.
    hot = [r["cnt"] for r in rows if r["tok"] == "hot"]
    assert hot, "hot token evicted - MG guarantee broken"
    assert max(hot) <= 55
    assert max(hot) >= 55 - 135 // (cap + 1)
    # bounded state: no emission ever exceeds capacity rows per bucket
    from collections import Counter

    per_bucket = Counter()
    for r in rows:
        per_bucket[r["bucket"]] += 0  # buckets seen
    # emissions are per (micro-batch, bucket); each must be <= cap+1
    # counters - check via grouping on an emission fingerprint is not
    # possible from the memory sink, so assert the total distinct
    # tokens per bucket stays far below the distinct-token count (120)
    distinct_per_bucket = Counter()
    for r in rows:
        distinct_per_bucket[(r["bucket"], r["tok"])] = 1
    assert len(distinct_per_bucket) < 120


def test_continuous_rollup_union_tail_equals_full_batch(spark, tmp_path):
    # Hypertable-rollup pattern: stream two days of events through the
    # watermarked tumbling rollup into the idempotent parquet sink,
    # then answer "counts per (day, type)" as rolled history UNION
    # freshly-aggregated raw tail — and require bit-equality with the
    # full batch aggregation of all raw events.
    import datetime as dt

    from kinesis_handler_spark.streaming.rollup import (
        rollup_stream,
        rollup_with_tail,
        write_rollup_batch,
    )

    day1 = [
        _ev(i, f"2024-01-01T0{i % 8}:15:00", etype="click", value=1.5)
        for i in range(10)
    ] + [_ev(20 + i, f"2024-01-01T1{i % 5}:45:00", etype="view", value=2.0)
         for i in range(6)]
    day2 = [
        _ev(40 + i, f"2024-01-02T0{i % 6}:30:00", etype="click", value=0.5)
        for i in range(8)
    ]
    # tail: day 3, never streamed - lives only in "raw"
    tail = [
        _ev(60 + i, f"2024-01-03T0{i % 4}:10:00", etype="click", value=3.0)
        for i in range(5)
    ]
    src = tmp_path / "roll_src"
    src.mkdir()
    _write(src / "b0.json", day1, mtime=1_700_000_000)
    _write(src / "b1.json", day2, mtime=1_700_000_100)
    # late closing batch: far-future event advances the watermark so
    # day-2's bucket finalizes and is APPENDED before the stream ends
    _write(src / "b2.json", [_ev(99, "2024-01-10T00:00:00", etype="wm")],
           mtime=1_700_000_200)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    rollup_path = str(tmp_path / "rollup")
    q = (
        rollup_stream(stream, width="1 day", watermark="1 hour")
        .writeStream.foreachBatch(
            lambda df, bid: write_rollup_batch(df, bid, rollup_path)
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "roll_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    raw_all = _batch_df(spark, day1 + day2 + tail + [
        {"event_id": 99, "ts": "2024-01-10T00:00:00", "user_id": 1,
         "event_type": "wm", "value": 1.0}])
    cutoff = dt.datetime(2024, 1, 3)
    got = {
        (str(r["win_start"]), r["event_type"]): (r["n"], r["total"])
        for r in rollup_with_tail(
            spark, rollup_path, raw_all, cutoff, width="1 day"
        ).collect()
    }
    # ground truth: full batch aggregation over ALL raw events
    from kinesis_handler_spark.streaming import tumbling_aggregate

    want = {
        (str(r["win_start"]), r["event_type"]): (r["n"], r["total"])
        for r in tumbling_aggregate(
            raw_all, window="1 day", watermark=None
        ).collect()
        if str(r["win_start"]) < "2024-01-10"  # wm sentinel bucket: not finalized
    }
    want = {k: v for k, v in want.items() if k[1] != "wm"}
    got = {k: v for k, v in got.items() if k[1] != "wm"}
    assert got == want
    # replay idempotence: re-writing the last batch must not change the read
    last = spark.read.parquet(rollup_path)
    import pyspark.sql.functions as F

    max_bid = last.agg(F.max("batch_id")).collect()[0][0]
    replay = last.filter(F.col("batch_id") == max_bid).drop("batch_id")
    write_rollup_batch(replay, max_bid, rollup_path)
    got2 = {
        (str(r["win_start"]), r["event_type"]): (r["n"], r["total"])
        for r in rollup_with_tail(
            spark, rollup_path, raw_all, cutoff, width="1 day"
        ).collect()
    }
    got2 = {k: v for k, v in got2.items() if k[1] != "wm"}
    assert got2 == want
