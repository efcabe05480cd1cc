"""Corpus-hygiene operators (round 5): BPE-style token accounting and
benchmark-contamination detection — the bookkeeping a training-data
pipeline runs before any corpus ships.

Both are oracle-backed: the regex tokenizer uses only syntax with
identical semantics in Java regex (Spark) and RE2 (DuckDB) — no
lookarounds, no backreferences — and the contamination check reuses the
integer-exact shingle machinery of `dedup_near_jaccard`.

Reference note: the reference library (lib/kinesisHandler.js) has no
text surface — these are north-star mandates (SURVEY.md §2.B LLM-scale
family) following the registry.py determinism rules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from kinesis_handler_spark.functions.worker_tune import tuned
from kinesis_handler_spark.functions.lineage import truncate
from kinesis_handler_spark.functions.text import normalize_text, word_ngrams
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

#: GPT-2-style pre-tokenizer pattern, simplified to the lookahead-free
#: subset RE2 supports (DuckDB) so both engines split identically:
#: contraction suffixes, space-prefixed letter runs, space-prefixed
#: digit runs, space-prefixed punctuation runs, whitespace runs.
_BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


@query(
    "text_token_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok_ws,
           CAST(len(regexp_extract_all(text,
             '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+|\\s+'
           )) AS INTEGER) AS n_tok_bpe,
           CAST(n_chars AS DOUBLE)
             / len(regexp_extract_all(text,
                 '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+|\\s+'
               )) AS chars_per_tok
    FROM documents
    """,
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both tiers the mandate names: naive whitespace
    split and a BPE-ish pre-tokenizer regex (GPT-2's pattern minus its
    `\\s+(?!\\S)` lookahead, which RE2 — and therefore the DuckDB
    oracle — cannot express; the remaining alternation has identical
    semantics in Java regex and RE2).  chars-per-token is the standard
    pre-training corpus health metric (≈4 for clean English; far off
    means boilerplate, code, or the wrong language).  Pure per-row JVM
    regex — no shuffle, no Python; scales embarrassingly."""
    d = table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    n_bpe = F.size(bpe)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("int").alias("n_tok_ws"),
        n_bpe.cast("int").alias("n_tok_bpe"),
        (F.col("n_chars").cast("double") / n_bpe).alias("chars_per_tok"),
    )


@query(
    "contamination_ngram_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 5
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i FROM toks
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                  || t[i+3] || ' ' || t[i+4] AS shingle
      FROM idx
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    ),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1
    ),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_matched
      FROM corpus c JOIN bench b ON b.shingle = c.shingle
      GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(s.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
           CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / s.n_shingles
             AS contamination
    FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each corpus document's
    distinct 5-word shingles that also appear in the held-out benchmark
    set (deterministically designated as doc_id % 97 == 0 — in
    production this side is the actual eval-suite corpus).  The
    decisive scale property: the join is corpus-shingles AGAINST the
    benchmark shingle set, never corpus-against-corpus — benchmark
    suites are tiny relative to training corpora, so the right side
    broadcasts under AQE (no hint: it still scales with the suite) and
    the check is one map-side semi-ish join + two aggregates.  Counts
    are integers and the contamination ratio is one IEEE division, so
    both engines agree exactly."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= 5)
    sh = (
        base.select(
            "doc_id",
            F.explode(word_ngrams("t", 5)).alias("shingle"),
        )
        .distinct()
        # the shingle table feeds both the benchmark and corpus sides —
        # materialize once instead of re-running explode+distinct twice
        .transform(truncate)
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    sizes = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    matched = F.coalesce(F.col("n_matched"), F.lit(0))
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            matched.cast("bigint").alias("n_matched"),
            (matched.cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
    )


@query(
    "text_entropy",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    x AS (
      SELECT doc_id, unnest(toks) AS tok, len(toks) AS n FROM t
    ),
    c AS (
      SELECT doc_id, tok, n, COUNT(*) AS cnt FROM x GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(MAX(n) AS INTEGER) AS n_tokens,
           CAST(COUNT(*) AS INTEGER) AS n_distinct,
           ROUND(-SUM((cnt * 1.0 / n) * log2(cnt * 1.0 / n)), 6)
             AS entropy_bits
    FROM c GROUP BY doc_id
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (bits) — the
    information-density quality signal: boilerplate and template spam
    sit far below natural text's entropy for the same length, so this
    column is a standard corpus-filter feature alongside
    `text_repetition_ratio` (which catches ADJACENT duplication;
    entropy catches GLOBAL skew).  One explode + one (doc, token)
    count + one per-doc sum — two shuffles on doc-sized keys.
    Transcendental outputs are rounded to 6 dp on both engines (the
    `agg_stats_moments` precedent): double summation-order jitter is
    ~1e-12 while the rounding grid is 1e-6, so hashes agree."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    x = toks.select(
        "doc_id", F.explode("t").alias("tok"), F.size("t").alias("n")
    )
    c = x.groupBy("doc_id", "tok", "n").agg(F.count(F.lit(1)).alias("cnt"))
    p = F.col("cnt") * F.lit(1.0) / F.col("n")
    return c.groupBy("doc_id").agg(
        F.max("n").cast("int").alias("n_tokens"),
        F.count(F.lit(1)).cast("int").alias("n_distinct"),
        F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
    )


@query(
    "text_unigram_logloss",
    oracle="""
    WITH x AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    lm AS (
      SELECT tok, COUNT(*) AS cnt FROM x GROUP BY 1
    ),
    n AS (SELECT SUM(cnt) AS total FROM lm)
    SELECT x.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_tokens,
           ROUND(-SUM(log2(lm.cnt * 1.0 / n.total)) / COUNT(*), 6)
             AS bits_per_token
    FROM x JOIN lm ON lm.tok = x.tok, n
    GROUP BY x.doc_id
    """,
)
def text_unigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM log-loss per document (bits/token) — the CCNet-style
    language-model quality filter, simplified to the unigram case: fit
    token probabilities on the WHOLE corpus (one aggregate), then score
    each document by the mean negative log-probability of its tokens.
    Documents far above the corpus norm are gibberish/noise; far below
    are boilerplate — the two tails a RefinedWeb-style pipeline trims.
    Distinct from `text_entropy` (doc-local distribution): this scores
    each doc against the GLOBAL distribution.  Plan: token explode +
    one (token) count aggregate (the "LM"), then a token-keyed join
    back — the LM table is vocabulary-sized, so at 100 TB it broadcasts
    (vocab ≪ corpus) and the scoring pass is map-side; the global
    total is a one-row broadcast scalar.  Transcendental output
    6-dp-rounded on both engines (`agg_stats_moments` precedent)."""
    d = table(spark, sf_dir, "documents")
    x = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    lm = x.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") * F.lit(1.0) / F.col("total")
    return (
        x.join(lm, "tok")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(-F.sum(F.log2(p)) / F.count(F.lit(1)), 6).alias(
                "bits_per_token"
            ),
        )
    )


def _mg_candidates(batches, cap: int = 2048):
    """Per-partition Misra-Gries candidate pass for
    `text_heavy_hitters` (mapInPandas body; see docstring there —
    mapInPandas passes only the batch iterator, so ``cap`` keeps its
    default there; tests shrink it to stress the guarantee).

    Mergeable-summary compression (Agarwal et al., "Mergeable
    Summaries", PODS'12): when the counter table exceeds capacity k,
    subtract the (k+1)-th largest count from every counter and drop
    the non-positives.  Total undercount per item is bounded by
    n_partition/(k+1), so any token with local frequency share above
    1/(k+1) is guaranteed to survive to the candidate set.
    """
    import pandas as pd

    counts: dict[str, int] = {}
    for pdf in batches:
        for tok, c in pdf["tok"].value_counts().items():
            counts[tok] = counts.get(tok, 0) + int(c)
        if len(counts) > cap:
            s = pd.Series(counts)
            s = s - s.nlargest(cap + 1).iloc[-1]
            counts = s[s > 0].to_dict()
    yield pd.DataFrame({"tok": list(counts)})


@query(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(trim(regexp_replace(regexp_replace(regexp_replace(
               lower(text), '\\p{M}', '', 'g'),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
               ' ')) AS tok
      FROM documents
    ),
    t2 AS (SELECT tok FROM toks WHERE tok <> ''),
    tot AS (SELECT COUNT(*) AS n FROM t2)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM t2, tot
    GROUP BY tok, n
    HAVING COUNT(*) >= 0.003 * n
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with frequency share >=
    0.3%) via the scalable two-phase algorithm: (1) a per-partition
    Misra-Gries summary (capacity 2048 >> 1/0.003) emits a small
    candidate set that provably contains every global heavy hitter —
    if a token's global share is >= theta, by pigeonhole its share is
    >= theta in at least one partition, and MG keeps everything above
    1/(k+1) locally; (2) an exact count restricted to the candidates
    (broadcast left-semi join) + the global total, filtered at the
    threshold.  The final answer is EXACTLY the true heavy-hitter set
    — the sketch only prunes, never decides.

    100 TB: a naive groupBy(token) shuffles every token occurrence of
    the corpus (billions of distinct keys); here the shuffle carries
    only candidates-per-partition (<= 2048 x partitions rows) plus the
    candidate-filtered occurrences.  The MG pass is Arrow-batched
    pandas (value_counts + vectorized compression), the one
    deliberately-Python stage in this family.
    Tokenizer = shared `normalize_text` (functions/text.py), mirrored
    by the oracle's regexp chain."""
    d = table(spark, sf_dir, "documents")
    # Materialize the token stream once: three consumers scan it (MG
    # candidates, global total, candidate-filtered exact count), and
    # without materialization each re-runs the 3-regex normalize chain
    # + explode over the full corpus (sf1.0 probe: 14.9 s → 6.3 s).
    # persist(DISK_ONLY), NOT localCheckpoint (ADVICE r6): both write
    # the exploded stream — larger than the source corpus — to executor
    # local disks exactly once, but persist keeps the lineage, so at
    # 100 TB an executor loss mid-query recomputes the lost partitions
    # instead of failing the job on truncated lineage.
    toks = (
        d.select(
            F.explode(F.split(normalize_text("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .persist(StorageLevel.DISK_ONLY)
    )
    cand = toks.mapInPandas(tuned(_mg_candidates), schema="tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(cand), "tok", "leftsemi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(0.003) * F.col("n"))
        .select("tok", "cnt")
    )


#: Oracle-SQL mirror of ``normalize_text`` (functions/text.py) — must
#: change in lockstep with it (same chain as the text_heavy_hitters /
#: text_normalize oracles).
_NORM_SQL = """trim(regexp_replace(regexp_replace(regexp_replace(
               lower(text), '\\p{M}', '', 'g'),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"""


@query(
    "corpus_inverted_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    tf AS (
      SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM t2 GROUP BY 1, 2
    ),
    stats AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY 1
    ),
    top AS (
      SELECT tok, doc_id, tf,
             ROW_NUMBER() OVER (
               PARTITION BY tok ORDER BY tf DESC, doc_id
             ) AS rn
      FROM tf
    ),
    post AS (
      SELECT tok,
             string_agg(
               CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
               ',' ORDER BY rn
             ) AS postings
      FROM top WHERE rn <= 5 GROUP BY tok
    )
    SELECT s.tok, s.df, s.total_tf, p.postings
    FROM stats s JOIN post p USING (tok)
    WHERE s.df >= 3
    """,
)
def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted-index construction: for every normalized token
    appearing in >= 3 documents, its document frequency, total term
    frequency, and a posting list of the top-5 documents by
    (tf DESC, doc_id) rendered ``doc:tf,doc:tf`` — the IR-index build
    a corpus-grep / retrieval layer runs over a crawl.

    Determinism: the rank key (tf DESC, doc_id) is TOTAL within a term
    (doc_id is unique per (tok, doc) group after the tf aggregation),
    so the capped posting order is engine-independent, and the oracle
    anchors its string_agg on the same single ROW_NUMBER pass (rn
    rule).  NULL-identity/NULL-text docs cannot be indexed and are
    filtered on both sides (totality rule).

    100 TB: the per-term top-5 is a rank-limit window — Spark's
    WindowGroupLimit pushes the limit into a PER-PARTITION partial
    pass before the shuffle, so a stop-word term moves at most
    5 × n_partitions candidate postings instead of its full
    document list; the df/total_tf aggregate is partial+final on the
    same (tok, doc)-reduced frame (vocabulary-sized output, Heaps-law
    sublinear in corpus size).  No Python, no collect."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    tf = (
        d.select(
            "doc_id",
            F.explode(F.split(normalize_text("text"), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    stats = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    post = (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("tok")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "doc_id", "tf"))
                    ),
                    lambda x: F.format_string(
                        "%d:%d", x["doc_id"], x["tf"]
                    ),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(post, "tok").where(F.col("df") >= 3).select(
        "tok", "df", "total_tf", "postings"
    )


@query(
    "text_lm_bigram_logloss",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks)
    ),
    lm AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_bigrams,
           CASE WHEN ROUND(-SUM(log2(lm.c12 * 1.0 / ctx.c1)) / COUNT(*), 6)
                     = 0e0 THEN 0e0
                ELSE ROUND(-SUM(log2(lm.c12 * 1.0 / ctx.c1)) / COUNT(*), 6)
           END AS bits_per_bigram
    FROM bg
    JOIN lm  ON lm.w1 = bg.w1 AND lm.w2 = bg.w2
    JOIN ctx ON ctx.w1 = bg.w1
    GROUP BY bg.doc_id
    """,
)
def text_lm_bigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM log-loss per document (bits/bigram) — the order-2
    sibling of `text_unigram_logloss`: fit MLE bigram transition
    probabilities P(w2|w1) = count(w1 w2)/count(w1 ·) on the whole
    corpus, then score each document by the mean negative
    log-probability of its transitions.  The unigram filter scores
    VOCABULARY plausibility; this scores SEQUENCE plausibility —
    shuffled-word salad with a normal vocabulary sails through the
    unigram gate and fails here (the CCNet/KenLM signal, truncated to
    order 2 so the model table stays closed-form).  MLE needs no
    smoothing for scoring the training corpus itself: every document
    bigram exists in the fitted counts by construction.

    Plan: one positional-shingle pass (per-row transform, no explode
    until the pair table), one (w1,w2) aggregate = the LM, one (w1)
    re-aggregate = the context margin, then token-keyed joins back.
    Both model tables are vocabulary²-bounded — at 100 TB they
    broadcast (bigram types ≪ corpus tokens) and scoring is map-side.
    Transcendental output 6-dp-rounded both engines
    (`agg_stats_moments` precedent)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        "doc_id", F.explode(word_ngrams("t", 2)).alias("big")
    ).select(
        "doc_id",
        F.split("big", " ").getItem(0).alias("w1"),
        F.split("big", " ").getItem(1).alias("w2"),
    ).transform(truncate)
    lm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = lm.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    p = F.col("c12") * F.lit(1.0) / F.col("c1")
    return (
        bg.join(lm, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            # -0.0-canonicalized (events_cdc_apply precedent): a doc
            # whose every transition has P=1 sums to -0.0 on one engine
            # and +0.0 on the other.
            F.when(
                F.round(-F.sum(F.log2(p)) / F.count(F.lit(1)), 6)
                == F.lit(0.0),
                F.lit(0.0),
            )
            .otherwise(F.round(-F.sum(F.log2(p)) / F.count(F.lit(1)), 6))
            .alias("bits_per_bigram"),
        )
    )


#: RE2-safe PII patterns (no lookarounds/backrefs — identical semantics
#: in Java regex and DuckDB's RE2): email, dotted-quad IP, NANP phone.
_PII_EMAIL = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


@query(
    "text_pii_audit",
    oracle="""
    WITH seeded AS (
      SELECT source, doc_id,
             text
             || CASE WHEN ((doc_id % 7) + 7) % 7 = 0
                     THEN ' reach user' || CAST(doc_id AS VARCHAR)
                          || '@mail' || CAST(((doc_id % 13) + 13) % 13
                                            AS VARCHAR) || '.com'
                     ELSE '' END
             || CASE WHEN ((doc_id % 11) + 11) % 11 = 0
                     THEN ' from 10.' || CAST(((doc_id % 256) + 256) % 256 AS VARCHAR)
                          || '.' || CAST(((doc_id % 251) + 251) % 251 AS VARCHAR)
                          || '.' || CAST(((doc_id % 241) + 241) % 241 AS VARCHAR)
                     ELSE '' END
             || CASE WHEN ((doc_id % 13) + 13) % 13 = 0
                     THEN ' call 555-' || CAST(100 + ((doc_id % 900) + 900) % 900 AS VARCHAR)
                          || '-' || CAST(1000 + ((doc_id % 9000) + 9000) % 9000 AS VARCHAR)
                     ELSE '' END AS audited
      FROM documents
    ),
    scored AS (
      SELECT source,
             COALESCE(len(regexp_extract_all(audited,
               '[a-z0-9]+@[a-z0-9]+\\.[a-z]+')), 0) AS n_email,
             COALESCE(len(regexp_extract_all(audited,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')), 0) AS n_ip,
             COALESCE(len(regexp_extract_all(audited,
               '\\b\\d{3}-\\d{3}-\\d{4}\\b')), 0) AS n_phone,
             COALESCE(len(audited) - len(
               regexp_replace(regexp_replace(regexp_replace(audited,
                 '[a-z0-9]+@[a-z0-9]+\\.[a-z]+', '', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '', 'g'),
                 '\\b\\d{3}-\\d{3}-\\d{4}\\b', '', 'g')), 0)
               AS redact_chars
      FROM seeded
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email + n_ip + n_phone > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_email) AS BIGINT) AS n_email,
           CAST(SUM(n_ip) AS BIGINT) AS n_ip,
           CAST(SUM(n_phone) AS BIGINT) AS n_phone,
           CAST(SUM(redact_chars) AS BIGINT) AS redact_chars
    FROM scored GROUP BY source
    """,
)
def text_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII audit — the compliance rollup a curation pipeline runs
    before any corpus ships: per source, how many documents carry PII,
    entity counts by class (email / IP / phone), and how many
    characters full redaction would remove.  The synthetic corpus
    carries no PII, so — the media-builder precedent — a deterministic
    doc_id-derived seeding stage plants entities in known residue
    classes first; the AUDIT stage (the operator under test) then
    rediscovers them with RE2-safe regexes evaluated identically by
    Java regex and DuckDB.  Redaction cost is measured as the length
    delta of a chained regexp_replace — the same expression a real
    scrub pass applies, so the audit IS the dry run of the scrubber.

    100 TB: pure per-row JVM regex fused into the scan (no Python, no
    shuffle before the O(#sources) rollup); pattern count scales the
    per-row cost linearly and nothing else."""
    d = table(spark, sf_dir, "documents")

    def nn(m: int) -> F.Column:
        return F.pmod(F.col("doc_id"), F.lit(m)).cast("string")

    audited = F.concat(
        F.col("text"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(7)) == 0,
            F.concat(
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail"), nn(13), F.lit(".com"),
            ),
        ).otherwise(""),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(11)) == 0,
            F.concat(
                F.lit(" from 10."), nn(256), F.lit("."), nn(251),
                F.lit("."), nn(241),
            ),
        ).otherwise(""),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(13)) == 0,
            F.concat(
                F.lit(" call 555-"),
                (F.lit(100) + F.pmod(F.col("doc_id"), F.lit(900))).cast("string"),
                F.lit("-"),
                (F.lit(1000) + F.pmod(F.col("doc_id"), F.lit(9000))).cast("string"),
            ),
        ).otherwise(""),
    )
    n_email = F.coalesce(
        F.size(F.regexp_extract_all(audited, F.lit(_PII_EMAIL), 0)), F.lit(0)
    )
    n_ip = F.coalesce(
        F.size(F.regexp_extract_all(audited, F.lit(_PII_IP), 0)), F.lit(0)
    )
    n_phone = F.coalesce(
        F.size(F.regexp_extract_all(audited, F.lit(_PII_PHONE), 0)), F.lit(0)
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(audited, _PII_EMAIL, ""), _PII_IP, ""
        ),
        _PII_PHONE,
        "",
    )
    redact_chars = F.coalesce(
        F.length(audited) - F.length(redacted), F.lit(0)
    )
    scored = d.select(
        "source",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        redact_chars.alias("redact_chars"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            ((F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0)
            .cast("int")
        ).cast("bigint").alias("docs_with_pii"),
        F.sum("n_email").cast("bigint").alias("n_email"),
        F.sum("n_ip").cast("bigint").alias("n_ip"),
        F.sum("n_phone").cast("bigint").alias("n_phone"),
        F.sum("redact_chars").cast("bigint").alias("redact_chars"),
    )


@query(
    "web_url_dedup",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             'https://'
             || CASE WHEN ((doc_id % 3) + 3) % 3 = 0 THEN 'WWW.' ELSE '' END
             || 'site' || CAST(((doc_id % 13) + 13) % 13 AS VARCHAR)
             || '.example/page/'
             || CAST(((doc_id % 17) + 17) % 17 AS VARCHAR)
             || CASE WHEN ((doc_id % 2) + 2) % 2 = 0
                     THEN '/?utm_source=feed&ref=rss&utm_campaign=x'
                     ELSE '' END
             || CASE WHEN ((doc_id % 5) + 5) % 5 = 0
                     THEN '#section-' || CAST(((doc_id % 7) + 7) % 7 AS VARCHAR)
                     ELSE '' END AS url
      FROM documents WHERE doc_id IS NOT NULL
    ),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(url, '#.*$', ''),
                     '([?&])utm_[a-z]+=[^&#]*', '\\1', 'g'),
                   '[?&]+$', ''),
                 '\\?&', '?'),
               '/+(\\?|$)', '\\1') AS stripped
      FROM seeded
    ),
    canon2 AS (
      SELECT doc_id, url,
             regexp_replace(
               lower(regexp_extract(stripped, '^https?://([^/]*)', 1)),
               '^www\\.', '')
             || regexp_replace(stripped, '^https?://[^/]*', '')
               AS canonical_url
      FROM canon
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants
    FROM canon2
    GROUP BY canonical_url
    """,
)
def web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level canonicalization + dedup — the FIRST dedup stage of
    every crawl pipeline (CCNet/RefinedWeb run it before any content
    hashing, because re-crawls and tracking-param variants dominate raw
    URL multiplicity): strip the fragment, strip ``utm_*`` tracking
    params (repairing the separator chain), drop a trailing slash,
    lowercase the host and fold ``www.`` — then keep the minimum doc_id
    per canonical URL.  The corpus has no URL column, so — the
    PII-audit precedent — a deterministic doc_id-derived seeding stage
    mints realistic messy URLs (mixed-case ``WWW.`` hosts, tracking
    params around one surviving ``ref=`` param, fragments, trailing
    slashes) whose residue classes (site mod 13 × page mod 17 ×
    parity = 442 canonicals) guarantee real collisions from ~450 docs
    up — including cross-``www`` merges (period 442 is coprime to the
    mod-3 www flag) — so every documented variant class demonstrably
    folds at sf0.01; the CANONICALIZER is the operator under test,
    RE2-safe and evaluated identically by Java regex and DuckDB.

    100 TB: pure per-row JVM regex fused into the scan; the dedup is
    one groupBy on the canonical key (the same shuffle profile as
    `dedup_exact`), output bounded by distinct canonical URLs."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())

    def nn(m: int) -> F.Column:
        return F.pmod(F.col("doc_id"), F.lit(m)).cast("string")

    url = F.concat(
        F.lit("https://"),
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, "WWW.").otherwise(""),
        F.lit("site"), nn(13), F.lit(".example/page/"), nn(17),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(2)) == 0,
            F.lit("/?utm_source=feed&ref=rss&utm_campaign=x"),
        ).otherwise(""),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(5)) == 0,
            F.concat(F.lit("#section-"), nn(7)),
        ).otherwise(""),
    )
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(url, r"#.*$", ""),
                    r"([?&])utm_[a-z]+=[^&#]*",
                    r"$1",
                ),
                r"[?&]+$",
                "",
            ),
            r"\?&",
            "?",
        ),
        r"/+(\?|$)",
        r"$1",
    )
    canonical = F.concat(
        F.regexp_replace(
            F.lower(F.regexp_extract(stripped, r"^https?://([^/]*)", 1)),
            r"^www\.",
            "",
        ),
        F.regexp_replace(stripped, r"^https?://[^/]*", ""),
    )
    canon = d.select(
        "doc_id", url.alias("url"), canonical.alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("keep_doc"),
        F.countDistinct("url").cast("bigint").alias("n_variants"),
    )


@query(
    "web_html_extract",
    oracle="""
    WITH seeded AS (
      SELECT doc_id, text,
             '<html><head><title>Site ' || CAST(((doc_id % 13) + 13) % 13 AS VARCHAR)
             || ' &amp; Co &#8212; page ' || CAST(((doc_id % 17) + 17) % 17 AS VARCHAR)
             || '</title><script>var t=' || CAST(doc_id AS VARCHAR)
             || ';track(t);</script></head><body><nav><a href="/">home</a>'
             || '<a href="/about">about</a>'
             || CASE WHEN ((doc_id % 3) + 3) % 3 = 0
                     THEN '<a href="/promo">promo &lt;deals&gt;</a>'
                     ELSE '' END
             || '</nav><p>' || text || '</p><footer>&copy; site '
             || CAST(((doc_id % 13) + 13) % 13 AS VARCHAR)
             || ' <a href="/tos">terms</a></footer></body></html>' AS html
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    stripped AS (
      SELECT doc_id, text, html,
             regexp_extract(html, '<title>([^<]*)</title>', 1) AS title_raw,
             CAST(len(regexp_extract_all(html, '<a ')) AS BIGINT) AS n_links,
             trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(html,
                 '<script>.*?</script>', ' ', 'g'),
                 '<nav>.*?</nav>', ' ', 'g'),
                 '<footer>.*?</footer>', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
               ' +', ' ', 'g')) AS extracted
      FROM seeded
    )
    SELECT doc_id,
           CAST(length(html) AS BIGINT) AS raw_len,
           CAST(length(extracted) AS BIGINT) AS extracted_len,
           n_links,
           replace(replace(replace(title_raw, '&amp;', '&'),
                   '&#8212;', '-'), '&lt;', '<') AS title,
           (extracted = text) AS clean
    FROM stripped
    """,
)
def web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML MAIN-TEXT EXTRACTION — the stage BEFORE every text-hygiene
    operator in a real crawl (Trafilatura/jusText reduced to the
    engine's deterministic form): drop ``<script>`` payloads and
    ``<nav>``/``<footer>`` boilerplate blocks, strip remaining markup,
    unescape the title's entities, collapse whitespace — and verify
    the recovered body equals the pre-wrap text (``clean`` flags the
    round trip per document, hash-checked, so the extractor provably
    removes ALL chrome and NO content).  The corpus has no HTML column,
    so — the ``web_url_dedup``/PII-audit seeding precedent — each doc is
    wrapped in deterministic doc_id-derived chrome: entity-bearing
    title, tracking script, nav with a variable link set (the mod-3
    class grows a third link), footer with an entity and a link.

    RE2-safe regexes only (non-greedy block strips, no lookarounds) —
    Java regex and DuckDB RE2 evaluate them identically; the block
    strips are anchored to the seeded single-line shape (real HTML
    would pre-normalize newlines in the same pass).

    100 TB: pure per-row JVM regex fused into the scan — zero shuffle,
    embarrassingly parallel, the cheapest stage of the pipeline; the
    output is row-per-doc (no aggregation) so the driver check hashes
    every document's extraction verdict."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )

    def nn(m: int) -> F.Column:
        return F.pmod(F.col("doc_id"), F.lit(m)).cast("string")

    html = F.concat(
        F.lit("<html><head><title>Site "), nn(13),
        F.lit(" &amp; Co &#8212; page "), nn(17),
        F.lit("</title><script>var t="),
        F.col("doc_id").cast("string"),
        F.lit(';track(t);</script></head><body><nav><a href="/">home</a>'
              '<a href="/about">about</a>'),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            '<a href="/promo">promo &lt;deals&gt;</a>',
        ).otherwise(""),
        F.lit("</nav><p>"), F.col("text"),
        F.lit("</p><footer>&copy; site "), nn(13),
        F.lit(' <a href="/tos">terms</a></footer></body></html>'),
    )
    extracted = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("html"), r"<script>.*?</script>", " "
                        ),
                        r"<nav>.*?</nav>",
                        " ",
                    ),
                    r"<footer>.*?</footer>",
                    " ",
                ),
                r"<[^>]+>",
                " ",
            ),
            r" +",
            " ",
        )
    )
    title = F.replace(
        F.replace(
            F.replace(
                F.regexp_extract(F.col("html"), r"<title>([^<]*)</title>", 1),
                F.lit("&amp;"),
                F.lit("&"),
            ),
            F.lit("&#8212;"),
            F.lit("-"),
        ),
        F.lit("&lt;"),
        F.lit("<"),
    )
    return (
        d.withColumn("html", html)
        .select(
            "doc_id",
            F.length("html").cast("bigint").alias("raw_len"),
            F.length(extracted).cast("bigint").alias("extracted_len"),
            F.size(F.regexp_extract_all(F.col("html"), F.lit("<a "), 0))
            .cast("bigint")
            .alias("n_links"),
            title.alias("title"),
            (extracted == F.col("text")).alias("clean"),
        )
    )
