"""Extra engine capabilities beyond the SURVEY §2.B checklist: batch
sessionization, first/last/nth windows, median+mode aggregates,
group-wise (scalar-subquery-shaped) filtering, token n-grams, embedding
vector stats, keep-latest dedup.

These round out the training-data-pipeline surface (sessionized event
streams, CDC-style latest-record dedup, n-gram features) with the same
contract as every other declared query: deterministic results, a DuckDB
oracle, and a shuffle-minimal 100 TB-shaped plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec, dec_sum
from kinesis_handler_spark.queries.llm import _clean_embeddings, _quantized
from kinesis_handler_spark.functions.text import word_ngrams
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "sessionize_gap",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US}
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id
                        ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM (
      SELECT event_id, user_id, ts,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts NULLS LAST, event_id NULLS LAST)
    ) t
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts at a user's first event
    or after a >30-minute gap; ``session_seq`` is the running session
    number per user (lag + conditional running sum — the standard
    gap-and-island rewrite).  ONE shuffle on user_id serves both windows;
    gaps are exact integer microseconds.  At scale this is the batch twin
    of ``streaming.windows.session_aggregate``.

    Duplicate-row-proof oracle (r6 verdict class): the LAG pass emits
    ROW_NUMBER() over the same window and the running-SUM pass orders by
    that rn, so both passes share one total order even when full-row
    duplicates make (ts, event_id) ambiguous — otherwise DuckDB may
    permute ties between its two parallel window sorts (~5% flake seen
    on the sibling scd2_intervals).  Spark computes both windows in one
    sorted pass and was already bit-stable."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", is_new.alias("is_new"))
        .select(
            "event_id",
            "user_id",
            F.sum("is_new").over(w_run).cast("long").alias("session_seq"),
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER (
             PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
           LAST_VALUE(event_type) OVER (
             PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type,
           NTH_VALUE(event_type, 2) OVER (
             PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_type
    FROM events
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value navigation windows with
    explicit frames (last/nth need the full-partition frame — the classic
    default-frame trap).  Single shuffle on user_id, total ordering with
    NULLS LAST pinned on both engines (registry NULL rules)."""
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    w_cur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_cur).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
    )


@query(
    "agg_median_mode",
    oracle="""
    WITH med AS (
      SELECT event_type, COUNT(*) AS n_events,
             CAST(median(value) AS DOUBLE) AS median_value
      FROM events GROUP BY event_type
    ),
    dow AS (
      SELECT event_type, day(ts) AS dom, COUNT(*) AS cnt
      FROM events GROUP BY event_type, day(ts)
    ),
    md AS (
      SELECT event_type, CAST(dom AS BIGINT) AS mode_day FROM (
        SELECT event_type, dom,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, dom) AS rn
        FROM dow
      ) WHERE rn = 1
    )
    SELECT m.event_type, m.n_events, m.median_value, md.mode_day
    FROM med m JOIN md ON m.event_type = md.event_type
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + deterministic mode per group.  Median interpolates
    identically in both engines ((a+b)/2 of sorted doubles — IEEE-exact);
    mode is computed as an explicit count-argmax with a total tie-break
    (count desc, value asc) rather than the engine's ``mode()`` whose tie
    behavior is unspecified."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.median("value").alias("median_value"),
    )
    dow = e.select("event_type", F.dayofmonth("ts").alias("dom")).groupBy(
        "event_type", "dom"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), F.col("dom"))
    md = (
        dow.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("dom").cast("long").alias("mode_day"))
    )
    return med.join(md, "event_type").select(
        "event_type", "n_events", "median_value", "mode_day"
    )


@query(
    "join_scalar_subquery",
    oracle="""
    WITH ca AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o JOIN ca ON o.o_custkey = ca.o_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(18,6)) * ca.n * 2 > ca.s * 3
    """,
)
def join_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above 1.5× their customer's average order value —
    the correlated-scalar-subquery pattern, decorrelated the way Catalyst
    itself rewrites it: per-customer aggregate + equi-join back.  The
    threshold test is pure decimal/integer cross-multiplication
    (price·n·2 > sum·3), exact in both engines — no float division."""
    o = table(spark, sf_dir, "orders")
    # NOTE: `s` stays DECIMAL (not dec_sum's double) — it feeds the exact
    # cross-multiplication filter below and never reaches the output.
    ca = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        o.join(ca, "o_custkey")
        .filter(dec("o_totalprice") * F.col("n") * 2 > F.col("s") * 3)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "text_ngram_bigrams",
    oracle="""
    WITH toks AS (
      SELECT lang, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    idx AS (
      SELECT lang, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
    ),
    bg AS (
      SELECT lang, t[i] || ' ' || t[i+1] AS bigram, COUNT(*) AS cnt
      FROM idx GROUP BY lang, t[i] || ' ' || t[i+1]
    )
    SELECT lang, bigram, cnt FROM (
      SELECT lang, bigram, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, bigram) AS rn
      FROM bg
    ) WHERE rn <= 5
    """,
)
def text_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 token bigrams per language by exact count — n-gram feature
    extraction (n=2; the 3-shingle variant powers ``dedup_near_jaccard``).
    One explode + one agg + one small window; vocabulary shuffles once."""
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    bg = (
        d.select("lang", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "lang",
            F.explode(word_ngrams("t", 2)).alias("bigram"),
        )
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("bigram"))
    return (
        bg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "bigram", "cnt")
    )


@query(
    "embed_vector_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(CAST((
             SELECT SUM(v * v) FROM (
               SELECT unnest(list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))) AS v
             )
           ) AS DOUBLE)) AS l2_norm_q,
           (SELECT MAX(ABS(v)) FROM (
              SELECT unnest(list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))) AS v
            )) AS max_abs_q
    FROM (SELECT * FROM embeddings
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
            AND len(embedding) = 64
            AND len(list_filter(embedding,
                  x -> x IS NULL OR NOT isfinite(CAST(x AS DOUBLE)))) = 0
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY vec_id) = 1)
    """,
)
def embed_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector stats over the packed embedding array — dimension, L2
    norm, max |component| — all on the ×1000 quantized integers so sums
    are exact and the final sqrt is one IEEE-exact double op.  Pure
    higher-order functions: no explode, no shuffle beyond the scan."""
    # Same dirty-data contract as every vector operator
    # (_clean_embeddings): stats over undecodable vectors belong to the
    # profiling queries, and the engines disagree on empty/NULL-element
    # array folds (DuckDB's list_sum skips NULLs, Spark's aggregate
    # propagates them).
    emb = _clean_embeddings(spark, sf_dir)
    q = _quantized()
    sumsq = F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    max_abs = F.array_max(F.transform(q, F.abs))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.sqrt(sumsq.cast("double")).alias("l2_norm_q"),
        max_abs.alias("max_abs_q"),
    )


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style dedup: keep each (user, event_type)'s LATEST record by
    event time (ties broken by event_id) — the compaction step of every
    incremental training-data feed.  Window + rn=1; Spark pushes the
    limit into the sort via WindowGroupLimit, so state per group is one
    row, not the group."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "window_time_bucket",
    oracle="""
    SELECT date_trunc('day', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def window_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via ``F.window`` — the SAME operator
    the streaming layer uses (`streaming.windows.tumbling_aggregate`),
    here in batch mode with a DuckDB ``date_trunc`` oracle, so the
    streaming table's windowing semantics get a hash-checked twin
    (1-day tumbling == day truncation for epoch-aligned windows).
    Shuffles once on (window, event_type); decimal sums keep the
    aggregate order-independent."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
