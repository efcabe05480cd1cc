"""Training-data pipeline operators: chunking, repetition filtering,
deterministic sampling, event-sequence analytics, and exact statistical
aggregates.

SURVEY.md §2.B mandates the engine go beyond the reference surface
(`/root/reference/lib/kinesisHandler.js` has no analytics at all) with
the operations a large-scale LLM training-data pipeline needs.  This
module covers the *corpus preparation* steps that sit between raw
ingestion and dedup/similarity (which live in llm.py / llm_scale.py):

* ``text_chunk_overlap``   — split documents into fixed-size token
  windows with overlap (the "context window packing" pre-step).
* ``text_repetition_ratio`` — within-document duplicate-bigram fraction,
  the standard repetition filter signal (Gopher/C4-style rules).
* ``sample_hash_stratified`` — deterministic per-stratum downsampling by
  multiplicative hashing (reproducible corpus subsets, no RNG state).
* ``events_transition``    — event-type Markov transition counts.
* ``events_anomaly_zscore`` — per-type z-score outlier flagging from
  exact-decimal moments.
* ``agg_corr_regression``  — exact-arithmetic correlation + OLS slope.

100 TB design notes (every query here):

* All token/array work is JVM-side higher-order functions over a single
  scan — no Python, no explode-then-groupBy round trips where a
  per-row array expression suffices.
* The only shuffles are final aggregations on low-cardinality keys
  (event types, return flags) or a windowed partition by ``user_id`` —
  each O(rows) once, with map-side partial combine where applicable.
* Sampling and chunking are stateless per-row transforms: they pipeline
  into whatever scan precedes them and never materialize the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec_t
from kinesis_handler_spark.functions.text import normalize_text
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # tokens between chunk starts (CHUNK - STRIDE = 8 overlap)


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')
             AS chunk_text,
           CAST(least(start + {_CHUNK}, len(toks)) - start AS BIGINT)
             AS n_tokens
    FROM s
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks ({_CHUNK} tokens, stride
    {_STRIDE}) — the packing step that turns documents into
    training-window-sized pieces while preserving cross-boundary
    context in the 8-token overlap.

    Spark-first shape: tokenize once with ``split``, derive chunk
    starts with ``sequence`` (per-row array, no join against a numbers
    table), ``explode`` the starts, then ``slice``+``array_join`` —
    all whole-stage-codegen expressions on a single scan.  Output size
    is ~len/stride rows per doc; nothing shuffles (chunking is
    embarrassingly parallel), so at 100 TB this runs at scan speed."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("toks", F.col("start") + 1, F.lit(_CHUNK))
    return d.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Repetition filter signal
# ---------------------------------------------------------------------------


@query(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN []
                  ELSE list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i + 1])
             END AS bigrams
      FROM t
    )
    SELECT doc_id,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                           / CAST(len(bigrams) AS DOUBLE)
           END AS dup_ratio
    FROM b
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal: fraction of token bigrams
    that are duplicates (1 - distinct/total).  The classic C4/Gopher
    repetition-filter feature for dropping boilerplate and degenerate
    generations from a training corpus.

    Spark-first: bigrams, their count, and their distinct count are all
    per-row array expressions (``transform`` + ``array_distinct``) —
    no explode, no groupBy, no shuffle.  One scan, one narrow stage,
    scan-speed at any corpus size.  The ratio is a single IEEE division
    so both engines agree bit-for-bit."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = d.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) < 2 THEN array() "
            "ELSE transform(sequence(1, size(toks) - 1), "
            "     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
            "END"
        ).alias("bigrams"),
    )
    n = F.size("bigrams").cast("bigint")
    nd = F.size(F.array_distinct("bigrams")).cast("bigint")
    return d.select(
        "doc_id",
        n.alias("n_bigrams"),
        nd.alias("n_distinct"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) - nd.cast("double") / n.cast("double"))
        .alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# Knuth multiplicative hash: uniform enough for rate-based sampling and
# expressible as plain 64-bit integer arithmetic in ANY engine — the
# point is a *portable* deterministic sample (same subset from Spark,
# DuckDB, or a resumed pipeline run), unlike RNG-based df.sample whose
# output depends on partitioning.
#
# TOTALITY (r7 extreme-key twin find): the naive ``doc_id * KNUTH``
# overflows int64 for |doc_id| > 2^63/KNUTH ≈ 3.5e9, and BOTH engines
# raise on int64 overflow under ANSI semantics — one scraper-assigned
# full-range id would kill the whole job.  The hash is therefore
# computed as (pmod(doc_id, 2^32) * KNUTH) mod 2^32 with the multiply
# split at 16 bits so every intermediate stays below 2^49.  For the
# non-negative sub-2^32 ids of the fixtures this is bit-identical to
# the naive form (mod distributes over the product), so recorded
# outputs are unchanged; for extreme keys it is defined instead of
# fatal, and the pmod keeps buckets in [0, 1000) for negatives on both
# engines (Spark % and DuckDB % are both sign-of-dividend).
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32
_KHI, _KLO = divmod(_KNUTH, 65536)  # 40503, 31153


def _bucket_col(key: str):
    """[0, 1000) sampling bucket of a BIGINT key — overflow-free."""
    y = F.pmod(F.col(key), F.lit(_MOD))
    t1 = y * F.lit(_KLO)
    t3 = F.pmod(y * F.lit(_KHI), F.lit(_MOD)) * F.lit(65536)
    return F.pmod(t1 + F.pmod(t3, F.lit(_MOD)), F.lit(_MOD)) % F.lit(1000)


def _bucket_sql(key: str) -> str:
    """The identical bucket in portable SQL (DuckDB oracle side)."""
    y = f"((({key}) % {_MOD}) + {_MOD}) % {_MOD}"
    return (
        f"((({y}) * {_KLO} + ((({y}) * {_KHI}) % {_MOD}) * 65536 % {_MOD})"
        f" % {_MOD}) % 1000"
    )


@query(
    "sample_hash_stratified",
    oracle=f"""
    SELECT doc_id, lang, source,
           {_bucket_sql("doc_id")} AS bucket
    FROM documents
    WHERE {_bucket_sql("doc_id")}
          < CASE WHEN lang = 'en' THEN 100 ELSE 200 END
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep 10% of English docs
    and 20% of every other language (rebalancing a skewed corpus), with
    membership decided by a multiplicative hash of the stable key —
    reproducible across engines, runs, and partitionings, unlike
    ``df.sample`` (partitioning-dependent RNG).

    At 100 TB this is a stateless per-row filter fused into the scan:
    no shuffle, no sort, no sampling state, and adding strata or
    re-rates only changes the CASE table."""
    d = table(spark, sf_dir, "documents")
    bucket = _bucket_col("doc_id")
    rate = F.when(F.col("lang") == "en", F.lit(100)).otherwise(F.lit(200))
    return (
        d.filter(bucket < rate)
        .select("doc_id", "lang", "source", bucket.alias("bucket"))
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics
# ---------------------------------------------------------------------------


@query(
    "events_transition",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) NULLS LAST, event_id NULLS LAST
             ) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM o
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type Markov transition matrix: per user, order events by
    time and count (state -> next state) pairs — the building block for
    session-flow and funnel-discovery analytics.

    One shuffle partitions by ``user_id`` for the window (lead), then
    the transition count is a low-cardinality hash aggregate with
    map-side combine.  Ordering is on integer microseconds + event_id
    so Spark (micros) and nanosecond-native engines sort identically,
    with NULLS LAST pinned on both (registry NULL rules)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc_nulls_last(),
        F.asc_nulls_last("event_id"),
    )
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,6))
                  AS DOUBLE) AS s1,
             CAST(CAST(FLOOR(SUM(CAST(value AS DECIMAL(12,4))
                                 * CAST(value AS DECIMAL(12,4))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS s2
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - m.s1 / m.n)
             / NULLIF(sqrt(GREATEST(m.s2 - m.s1 * m.s1 / m.n, 0)
                           / NULLIF(m.n - 1, 0)), 0) AS z
    FROM events e JOIN m ON m.event_type = e.event_type
    WHERE abs((e.value - m.s1 / m.n)
              / NULLIF(sqrt(GREATEST(m.s2 - m.s1 * m.s1 / m.n, 0)
                            / NULLIF(m.n - 1, 0)), 0)) > 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: flag events more than
    2.5 sample standard deviations from their type's mean value.

    Moments come from EXACT decimal sums (sum and sum-of-squares are
    order-independent), then mean/variance/z are one fixed sequence of
    IEEE double ops both engines evaluate identically — so even the
    float threshold comparison agrees.  The sum-of-squares is
    FLOOR-quantized to whole units before the double cast (see
    ``agg_corr_regression`` — wide-decimal→double rounding is not
    engine-portable past 2^53).  The stats table is a handful of
    rows and broadcast back onto the events scan: one aggregate pass +
    one broadcast join, no O(rows) shuffle at any scale."""
    e = table(spark, sf_dir, "events")
    v = dec_t(F.col("value"), "decimal(12,4)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(v).cast("decimal(38,6)").cast("double").alias("s1"),
        F.floor(F.sum(v * v)).cast("decimal(38,0)").cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    # NULLIF guards (identical in the oracle): a singleton group has
    # n-1 = 0 and a constant group has sd = 0 — Spark's ANSI divide
    # raises on BOTH (doubles included, unlike IEEE), so dirty slices
    # would kill the job.  NULL z-scores fall out of the > 2.5 filter
    # the same way in both engines.
    # GREATEST(·, 0) clamp (identical in the oracle): on a
    # near-constant group the catastrophic cancellation s2 - s1²/n can
    # land a hair below zero (the floor-quantized s2 shaves up to one
    # unit), and the engines then DIVERGE fatally — Spark sqrt(neg) is
    # NaN (which its NaN-greatest ordering would pass through the
    # > 2.5 filter), DuckDB sqrt(neg) raises.  Clamped, both produce
    # sd = 0 → NULLIF → NULL z → row dropped.  Found by the r7
    # hostile-JSON twin's duplicated-value rows.
    sd = F.nullif(
        F.sqrt(
            F.greatest(
                F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"),
                F.lit(0.0),
            )
            / F.nullif(F.col("n") - 1, F.lit(0.0))
        ),
        F.lit(0.0),
    )
    z = (F.col("value") - mean) / sd
    return (
        e.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


# ---------------------------------------------------------------------------
# Exact statistical aggregates
# ---------------------------------------------------------------------------


@query(
    "agg_corr_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(8,3))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,3))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(8,3))
                                 * CAST(l_quantity AS DECIMAL(8,3))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,3))
                                 * CAST(l_extendedprice AS DECIMAL(12,3))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS syy,
             CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(8,3))
                                 * CAST(l_extendedprice AS DECIMAL(12,3))))
                       AS DECIMAL(38,0)) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
             / NULLIF(sqrt(GREATEST(n * sxx - sx * sx, 0))
                      * sqrt(GREATEST(n * syy - sy * sy, 0)), 0)
             AS corr_qty_price,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS slope,
           (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx) / n
             AS intercept
    FROM m
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and OLS regression (quantity vs price) per
    return flag, computed from exact decimal co-moments rather than the
    engines' built-in CORR/REGR_* (whose streaming update order makes
    results engine- and partitioning-dependent).

    Five exact sums in ONE hash-aggregate pass (map-side combine, 3
    groups), then the closed-form corr/slope/intercept as a fixed IEEE
    op sequence — deterministic across engines and cluster sizes.

    The co-moment sums are FLOOR-quantized to whole units before the
    double cast: a scale-6 decimal whose integer representation exceeds
    2^53 rounds differently across engines (Spark casts the exact
    BigDecimal, DuckDB converts int128 then divides by 10^scale — two
    roundings), and decimal *downscale* itself truncates in DuckDB but
    rounds in Spark.  FLOOR is unambiguous, and integer→double is a
    single correctly-rounded conversion everywhere, at any magnitude —
    verified bit-equal at sf0.01 and sf0.1.  The quantization perturbs
    corr/slope by <1e-12 relative and is part of the operator spec."""
    li = table(spark, sf_dir, "lineitem")
    x = dec_t(F.col("l_quantity"), "decimal(8,3)")
    y = dec_t(F.col("l_extendedprice"), "decimal(12,3)")

    def dsum(col):
        return F.floor(F.sum(col)).cast("decimal(38,0)").cast("double")

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    # Degenerate-group guards (identical in the oracle; same class as
    # events_anomaly_zscore's, found by the r7 hostile-JSON twin and
    # hardened here as the latent sibling): a constant-x group makes
    # n·sxx − sx² exactly zero or — after the floor-shave — a hair
    # negative, where Spark's sqrt(neg)/x÷0 and DuckDB's genuinely
    # diverge (NaN/raise).  GREATEST clamps the discriminants, NULLIF
    # turns the zero denominators into NULL stats for that group.
    dx = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    slope = cov_n / dx
    denom = F.nullif(
        F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
        * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0))),
        F.lit(0.0),
    )
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        (cov_n / denom).alias("corr_qty_price"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus preparation (operator composition)
# ---------------------------------------------------------------------------


@query(
    "pipeline_corpus_prep",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
                                                '\\p{{M}}', '', 'g'),
                                                '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g')) AS ntext
      FROM documents
      WHERE lang IN ('en', 'de')
    ),
    quality AS (
      SELECT doc_id, lang, ntext,
             string_split(ntext, ' ') AS toks
      FROM norm
      WHERE len(string_split(ntext, ' ')) >= 20
    ),
    dedup AS (
      SELECT doc_id, lang, toks,
             row_number() OVER (PARTITION BY ntext ORDER BY doc_id) AS rn
      FROM quality
    ),
    sampled AS (
      SELECT doc_id, lang, toks
      FROM dedup
      WHERE rn = 1
        AND {_bucket_sql("doc_id")} < 500
    ),
    chunks AS (
      SELECT doc_id, lang, toks,
             unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
      FROM sampled
    )
    SELECT doc_id, lang,
           CAST(start // {_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')
             AS chunk_text,
           CAST(least(start + {_CHUNK}, len(toks)) - start AS BIGINT)
             AS n_tokens
    FROM chunks
    """,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus preparation — the composition every training
    run executes, as ONE declared query: language filter → normalize
    (lowercase / strip / collapse) → quality gate (≥20 tokens) → exact
    dedup on normalized text (keep lowest doc_id) → deterministic 50%
    hash sample → overlapping chunking.  Proves the pipeline operators
    COMPOSE: the whole thing is one Catalyst plan, so filters still
    push to the scan, the normalize/chunk stages stay whole-stage
    codegen, and the only shuffle is the dedup window on the normalized
    text key.

    100 TB notes: stage order is chosen so the shuffle sees the least
    data — language + length gates drop rows before the dedup exchange,
    and sampling halves chunk output before it is generated (the
    sample predicate runs on doc_id, pre-chunk).  At production scale
    the dedup key would be ``xxhash64(ntext)`` (32-byte shuffle keys,
    not full documents); the full-text key is kept here so the oracle
    can replicate it exactly."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de")
    )
    ntext = normalize_text("text")
    norm = d.select("doc_id", "lang", ntext.alias("ntext"))
    quality = norm.filter(F.size(F.split("ntext", " ")) >= 20)
    w = Window.partitionBy("ntext").orderBy("doc_id")
    bucket = _bucket_col("doc_id")
    sampled = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (bucket < 500))
        .select("doc_id", "lang", F.split("ntext", " ").alias("toks"))
    )
    chunks = sampled.select(
        "doc_id",
        "lang",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("toks", F.col("start") + 1, F.lit(_CHUNK))
    return chunks.select(
        "doc_id",
        "lang",
        (F.col("start") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )


_FUNNEL_STAGES = ["all", "non_null", "lang", "min_length", "exact_dedup"]

_FUNNEL_BASE_SQL = """
  WITH base AS (
    SELECT doc_id, text,
           CASE WHEN text IS NOT NULL
                THEN CAST(len(string_split(text, ' ')) AS BIGINT)
                ELSE 0 END AS n_tok,
           (text IS NOT NULL AND doc_id IS NOT NULL) AS s1,
           (text IS NOT NULL AND doc_id IS NOT NULL
            AND COALESCE(lang IN ('en', 'de'), FALSE)) AS s2
    FROM documents
  ),
  flagged AS (
    SELECT doc_id, text, n_tok, s1, s2, (s2 AND n_tok >= 20) AS s3
    FROM base
  ),
  staged AS (
    SELECT n_tok,
           CASE WHEN ROW_NUMBER() OVER (PARTITION BY text
                                        ORDER BY doc_id) = 1
                THEN 4 ELSE 3 END AS ms
    FROM flagged WHERE s3
    UNION ALL
    SELECT n_tok,
           CASE WHEN s2 THEN 2 WHEN s1 THEN 1 ELSE 0 END AS ms
    FROM flagged WHERE NOT s3
  ),
  agg AS (
    SELECT {cols} FROM staged
  )
"""


def _funnel_oracle() -> str:
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN ms >= {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS d{k}, "
        f"CAST(COALESCE(SUM(CASE WHEN ms >= {k} THEN n_tok END), 0)"
        f" AS BIGINT) AS t{k}"
        for k in range(5)
    )
    rows = " UNION ALL ".join(
        f"SELECT {k} AS stage, '{name}' AS stage_name,"
        f" d{k} AS n_docs, t{k} AS n_tokens FROM agg"
        for k, name in enumerate(_FUNNEL_STAGES)
    )
    return _FUNNEL_BASE_SQL.format(cols=cols) + rows


@query("pipeline_filter_funnel", oracle=_funnel_oracle())
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attrition report: how many documents (and tokens)
    survive each stage of the standard corpus-hygiene cascade — all →
    non-NULL identity/text → language whitelist → minimum length →
    exact-text dedup (keep lowest doc_id).  ``pipeline_corpus_prep``
    EMITS the surviving corpus; this op emits the per-stage ATTRITION
    the pipeline owner actually charts — the first artifact any
    data-curation review asks for, and the regression alarm when a
    crawler change silently halves a language.

    One scan computes every cumulative stage flag row-locally; the only
    shuffle before the final aggregate is the dedup ROW_NUMBER over
    exact text (partitioned by text — corpus-parallel, and full-row
    duplicates permute harmlessly because either copy surviving yields
    the same counts).  The 5-stage rollup reduces map-side to one row
    of 10 counters and UNPIVOTS via UNION ALL (the melt rule: DuckDB's
    UNPIVOT drops NULL cells).  NULL lang is explicitly COALESCEd into
    "fails the whitelist" on both engines — NULL ∧ TRUE is NULL, and a
    NULL stage flag would silently vanish from a CASE cascade.  Token
    counts for undecodable (NULL-text) docs are 0, not NULL, so stage
    sums stay total."""
    d = table(spark, sf_dir, "documents")
    n_tok = (
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split("text", " ")).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("n_tok")
    )
    s1 = F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    s2 = s1 & F.coalesce(
        F.col("lang").isin("en", "de"), F.lit(False)
    )
    base = d.select("doc_id", "text", n_tok, s1.alias("s1"), s2.alias("s2"))
    flagged = base.withColumn(
        "s3", F.col("s2") & (F.col("n_tok") >= 20)
    )
    rn = F.row_number().over(
        Window.partitionBy("text").orderBy(F.asc("doc_id"))
    )
    a = (
        flagged.filter(F.col("s3"))
        .select("n_tok", F.when(rn == 1, 4).otherwise(3).alias("ms"))
    )
    b = flagged.filter(~F.col("s3")).select(
        "n_tok",
        F.when(F.col("s2"), 2).when(F.col("s1"), 1).otherwise(0).alias("ms"),
    )
    staged = a.unionAll(b)
    aggs = []
    for k in range(5):
        hit = F.col("ms") >= k
        aggs.append(
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(f"d{k}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(hit, F.col("n_tok"))), F.lit(0))
            .cast("bigint")
            .alias(f"t{k}")
        )
    one = staged.agg(*aggs)
    # melt the one counter row by exploding an inline struct array —
    # a UNION ALL of five selects over `one` would recompute the scan
    # + window + aggregate five times (verified: 10 FileScans in that
    # plan); the explode keeps exactly one pass
    stages = F.array(
        *[
            F.struct(
                F.lit(k).alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(f"d{k}").alias("n_docs"),
                F.col(f"t{k}").alias("n_tokens"),
            )
            for k, name in enumerate(_FUNNEL_STAGES)
        ]
    )
    return one.select(F.explode(stages).alias("r")).select(
        "r.stage", "r.stage_name", "r.n_docs", "r.n_tokens"
    )


@query(
    "text_line_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 4
    ),
    lines AS (
      SELECT doc_id, (i - 1) / 4 AS line_no,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
               AS line
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 3, 4)) AS i
            FROM toks)
    ),
    df AS (
      SELECT line, COUNT(DISTINCT doc_id) AS n_docs FROM lines GROUP BY 1
    ),
    flagged AS (
      SELECT l.doc_id, l.line_no, l.line,
             (df.n_docs >= 3) AS boilerplate
      FROM lines l JOIN df ON df.line = l.line
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_lines,
           CAST(SUM(CASE WHEN boilerplate THEN 1 ELSE 0 END) AS INTEGER)
             AS n_removed,
           COALESCE(string_agg(CASE WHEN NOT boilerplate THEN line END,
                               ' ' ORDER BY line_no), '') AS kept_text
    FROM flagged GROUP BY doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate LINE removal (Raffel et al. 2020 §2.2: drop
    any line occurring ≥3 times in the corpus): segment each document
    into non-overlapping 4-token "lines" (the corpus is single-space
    prose, so fixed segments stand in for newline splits), count each
    distinct line's DOCUMENT frequency corpus-wide, cut every
    occurrence of lines hitting the threshold — navigation chrome,
    cookie banners, boilerplate headers — and rebuild the surviving
    text in position order.  DISTINCT from `dedup_span_trim` (which
    keeps one canonical copy of an 8-token span in its smallest doc):
    the C4 rule removes boilerplate from EVERY document including the
    first, because a line frequent across documents is template, not
    content.

    Plan: positional segmentation is a per-row transform (lines are
    non-overlapping, so output is ≤ tokens/4 rows); the line-frequency
    table aggregates to distinct-line cardinality and — like every
    vocabulary-shaped model table here — broadcasts at 100 TB; the
    rebuild is one per-doc position-ordered aggregation, bounded by
    max document length.  Rebuild ties anchor on line_no (a total
    order within doc), so the string_agg is deterministic."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 4
    )
    lines = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), ((F.size("t") - 4) / 4).cast("int")),
                lambda i: F.struct(
                    i.alias("line_no"),
                    F.concat_ws(
                        " ",
                        F.element_at("t", i * 4 + 1),
                        F.element_at("t", i * 4 + 2),
                        F.element_at("t", i * 4 + 3),
                        F.element_at("t", i * 4 + 4),
                    ).alias("line"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.line_no"), F.col("s.line"))
    df_counts = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = lines.join(df_counts, "line").select(
        "doc_id", "line_no", "line", (F.col("n_docs") >= 3).alias("boilerplate")
    )
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("boilerplate"),
                F.struct(F.col("line_no"), F.col("line")),
            )
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.sum(F.col("boilerplate").cast("int")).cast("int").alias("n_removed"),
        F.concat_ws(
            " ", F.transform(kept_sorted, lambda s: s["line"])
        ).alias("kept_text"),
    )


@query(
    "text_length_percentile_filter",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    ranked AS (
      SELECT lang, doc_id, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_tokens, doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM docs
    ),
    flagged AS (
      SELECT lang, n_tokens,
             (20 * rn > n AND 20 * rn <= 19 * n) AS kept
      FROM ranked
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           MIN(CASE WHEN kept THEN n_tokens END) AS kept_min_tokens,
           MAX(CASE WHEN kept THEN n_tokens END) AS kept_max_tokens,
           CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM flagged
    GROUP BY lang
    """,
)
def text_length_percentile_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-LANGUAGE length-percentile trim (CCNet §3.1 flavor: length
    cuts are computed within each language, because a 50-token Chinese
    document and a 50-token German document sit at very different
    quality percentiles): rank every document by token count inside its
    language and DROP the bottom and top 5% — truncated fragments and
    concatenation blobs respectively.  The percentile test is exact
    integer cross-multiplication on the rank (kept iff 20·rn > n and
    20·rn ≤ 19·n, rank ordered by (n_tokens, doc_id) — a TOTAL order,
    so both engines cut at identical documents; no float percentile, no
    APPROX).  Tiny groups degrade honestly: n=1 keeps nothing (its only
    doc is the top 5%).  Output: per-language doc/kept counts, the kept
    token-length envelope, and surviving token mass — the before/after
    report a curation review reads.

    100 TB: the rank is computed TWO-LEVEL (the pack_context_windows
    prefix-scan shape) because a naive ``row_number() OVER (PARTITION
    BY lang)`` sorts an entire language in ONE task — a guaranteed
    straggler when one language dominates a web corpus.  Level 1 ranks
    within (lang, n_tokens) groups — parallel across every distinct
    length; level 2 runs the cumulative count over the BOUNDED
    (lang, n_tokens) rollup (O(languages × distinct lengths) rows) and
    joins back co-partitioned.  rank = cum(count of shorter lengths) +
    rank-within-length — identical to the single-window form row for
    row (the DuckDB oracle keeps that form; the hash check pins the
    equivalence).  Output is O(#languages).  NULL langs group as their
    own bucket (both engines), NULL text/doc_id rows are unmeasurable
    and filtered on both sides (totality rule)."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    docs = d.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    # level 1: rank within each (lang, length) group — parallel, and
    # bounded per task by the count of EQUAL-length docs, never the
    # whole language
    w1 = Window.partitionBy("lang", "n_tokens").orderBy(
        F.asc_nulls_last("doc_id")
    )
    within = docs.select(
        "lang", "n_tokens", F.row_number().over(w1).alias("rn_in")
    )
    # level 2: cumulative offsets over the bounded length rollup
    rollup = docs.groupBy("lang", "n_tokens").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w2 = (
        Window.partitionBy("lang")
        .orderBy(F.asc_nulls_last("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = rollup.select(
        "lang",
        "n_tokens",
        (F.sum("cnt").over(w2) - F.col("cnt")).alias("before"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    # null-SAFE on lang: documents with NULL lang are a real group (the
    # oracle's PARTITION BY keeps them); a plain equality join key would
    # silently drop every one of them (ADVICE r10).  n_tokens is never
    # NULL (text is filtered non-null above), so plain equality there.
    ranked = within.alias("w").join(
        offsets.alias("o"),
        F.col("w.lang").eqNullSafe(F.col("o.lang"))
        & (F.col("w.n_tokens") == F.col("o.n_tokens")),
    ).select(
        F.col("w.lang").alias("lang"),
        F.col("w.n_tokens").alias("n_tokens"),
        (F.col("o.before") + F.col("w.rn_in")).alias("rn"),
        F.col("o.n").alias("n"),
    )
    kept = (20 * F.col("rn") > F.col("n")) & (
        20 * F.col("rn") <= 19 * F.col("n")
    )
    return ranked.select("lang", "n_tokens", kept.alias("kept")).groupBy(
        "lang"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.min(F.when(F.col("kept"), F.col("n_tokens"))).alias(
            "kept_min_tokens"
        ),
        F.max(F.when(F.col("kept"), F.col("n_tokens"))).alias(
            "kept_max_tokens"
        ),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("kept_tokens"),
    )
