"""Scale-mechanics operators: data layout (Z-order clustering), runtime
pre-filtering (Bloom semi-join), and frequency sketching (Count-Min).

Each of these is a mechanism a 100 TB deployment leans on — file
skipping, shuffle avoidance, bounded-memory frequency estimation — and
each is surfaced here as a DECLARED QUERY whose correctness is strictly
hash-checked: the Z-order and Count-Min constructions are reproduced
exactly by the DuckDB oracle (md5-derived hashing, pure integer bit
arithmetic), and the Bloom pre-filter's output is by construction equal
to the exact join it accelerates, so its oracle is the plain join.

Reference note: the reference library (lib/kinesisHandler.js) has no
storage/layout surface — these are north-star mandates (SURVEY.md §2.B
scale family) following the registry.py determinism rules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.lineage import truncate
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

# --------------------------------------------------------------------------
# Z-order layout
# --------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits per dimension -> 16-bit Morton key


def _morton_sql(x: str, y: str) -> str:
    """Morton (Z-order) interleave of two 8-bit values as explicit SQL —
    the same 16-term sum in Spark SQL and DuckDB (both define >> / & /
    * on BIGINT identically in-range)."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"((({y} >> {b}) & 1) * {1 << (2 * b + 1)})")
    return "(" + " + ".join(terms) + ")"


@query(
    "layout_zorder",
    oracle=f"""
    WITH dims AS (
      SELECT ((o_custkey % 256) + 256) % 256 AS x,
             ((date_diff('day', DATE '1992-01-01', o_orderdate) % 256) + 256)
               % 256 AS y,
             o_totalprice
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ),
    keyed AS (
      SELECT x, y, {_morton_sql('x', 'y')} >> 12 AS file_id
      FROM dims
    )
    SELECT CAST(file_id AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT)
             AS cell_span
    FROM keyed GROUP BY file_id
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data layout — the multi-dimensional clustering key behind
    Delta OPTIMIZE ZORDER BY / Iceberg sort orders: interleave the bits
    of two scan dimensions (customer bucket x order-date bucket) into a
    Morton key, assign rows to files by Morton range, and report each
    file's min/max envelope on BOTH dimensions.  A linear sort bounds
    one dimension and leaves the other spanning the full domain; the
    Morton envelope (``cell_span``, here ≤ 64x64 of a 256x256 domain
    per file at 16 files) is what lets min/max file statistics skip
    files for predicates on EITHER dimension — the file-skipping
    mechanism that matters more than any join strategy at 100 TB.
    The interleave is 16 explicit shift-mask-add terms evaluated
    identically by both engines; residues are pmod-style (extreme-key
    rule: never multiply a raw key).

    100 TB: the Morton key is a per-row scalar fused into the scan; the
    file assignment is the same repartitionByRange a real OPTIMIZE
    performs; the envelope audit aggregates to O(#files) rows."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    dims = o.select(
        F.pmod(F.col("o_custkey"), F.lit(256)).alias("x"),
        F.pmod(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")),
            F.lit(256),
        ).cast("bigint").alias("y"),
    )
    keyed = dims.select(
        "x", "y", F.expr(f"{_morton_sql('x', 'y')} >> 12").alias("file_id")
    )
    return keyed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("min_x"),
        F.max("x").cast("bigint").alias("max_x"),
        F.min("y").cast("bigint").alias("min_y"),
        F.max("y").cast("bigint").alias("max_y"),
        ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1))
        .cast("bigint")
        .alias("cell_span"),
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join pre-filter
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16  # 65536 bits = 1024 x int64 words
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 2


def _bloom_bit_cols(key: Column) -> list[Column]:
    """The K bit positions of ``key`` — xxhash64 with a per-function salt
    column (Spark-side only; the oracle never needs the hash because the
    exact join removes every false positive)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(_BLOOM_BITS))
        for j in range(_BLOOM_K)
    ]


def build_bloom(df: DataFrame, key: str) -> list[int]:
    """Aggregate a Bloom bitmap over ``df[key]`` distributed (per-word
    ``bit_or`` partial+final), then collect the O(1024)-row word table —
    the same bounded-driver-artifact contract as the IVF centroids.
    Returns the 1024-long word list (missing words zero-filled)."""
    bits = (
        df.select(F.explode(F.array(*_bloom_bit_cols(F.col(key)))).alias("bit"))
        .filter(F.col("bit").isNotNull())
        .select(
            F.expr("CAST(bit / 64 AS INT)").alias("word"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in bits:
        words[r["word"]] = r["bits"]
    return words


def bloom_might_contain(words: list[int], key_expr: str) -> Column:
    """Membership test against a collected bitmap: true iff every one of
    the K bits of ``key_expr`` (a SQL expression string) is set.  The
    bitmap rides the plan as a 1024-element array literal (8 KiB —
    broadcast-by-value, the same way a real runtime filter ships).
    Built as generated SQL because ``shiftleft``'s bit-count argument
    must be an expression here (the DataFrame helper only takes a
    literal).  Each of the K bit positions is hashed ONCE (the
    ``transform`` lambda binds it to ``b`` for both the word index and
    the mask) and the 1024-element bitmap literal appears ONCE in the
    generated SQL — the naive AND-of-tests form inlined each hash twice
    and the ~8 KiB array K times, betting on a common-subexpression
    elimination Spark does not guarantee for ``expr()`` strings."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    bits = ",".join(
        f"pmod(xxhash64({key_expr}, {j}), {_BLOOM_BITS})"
        for j in range(_BLOOM_K)
    )
    return F.expr(
        f"forall(transform(array({bits}), b -> "
        f"(element_at({arr}, CAST(b / 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(b % 64 AS INT))) != 0), v -> v)"
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    WHERE o.o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filtered semi-join — the explicit form of the
    runtime row-group filter every warehouse injects on selective
    joins: build a 64 Kbit / K=2 Bloom bitmap over the small side's
    keys (high-balance customers) as a distributed ``bit_or``
    aggregate, ship it by value, drop large-side rows (orders) whose
    key cannot be in the set BEFORE any shuffle, then run the exact
    broadcast semi-join on the survivors so false positives never
    reach the output.  Correctness is therefore EXACTLY the plain
    semi-join — the oracle runs that — while the scan-side prune rate
    (~89% of orders never leave the scan stage at the sf0.01 key
    selectivity; measured in tests/test_scale_ops.py) is the scale
    win: at 100 TB the pruned rows never pay shuffle write, network,
    or join-probe cost.

    100 TB: the bitmap is fixed 8 KiB regardless of corpus size (size
    it ~10 bits/key for 1% fp at real cardinalities); the build is a
    partial+final ``bit_or`` to 1024 rows — the same bounded-driver-
    artifact contract as the IVF centroid table; Spark's own AQE
    runtime filters do this implicitly, this operator is the portable
    explicit form with a pinned prune-rate test."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    keys = (
        c.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
        .filter(F.col("c_custkey").isNotNull())
        .transform(truncate)  # consumed twice: bloom build + exact join
    )
    words = build_bloom(keys, "c_custkey")
    candidates = o.filter(bloom_might_contain(words, "o_custkey"))
    exact = candidates.join(
        F.broadcast(keys),
        candidates.o_custkey == keys.c_custkey,
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row


def _hexval(expr: str) -> str:
    """SQL for the value of one lowercase hex digit via its codepoint —
    ascii() agrees across engines on ASCII input, and md5 hex is ASCII
    by construction."""
    return (
        f"(ascii({expr}) - 48 - "
        f"(CASE WHEN ascii({expr}) >= 97 THEN 39 ELSE 0 END))"
    )


def _cms_bucket_sql(tok: str, j: int) -> str:
    """Bucket of ``tok`` in hash row ``j``: the first 4 hex digits of
    md5(j || tok) as an integer, mod W.  md5 hashes the UTF-8 bytes in
    both engines, so multibyte tokens bucket identically."""
    md5 = f"md5('{j}:' || {tok})"
    val = " + ".join(
        f"({_hexval(f'substr({md5}, {i + 1}, 1)')} * {16 ** (3 - i)})"
        for i in range(4)
    )
    return f"(({val}) % {_CMS_W})"


def _cms_oracle() -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT tok, cnt, {j} AS j, {_cms_bucket_sql('tok', j)} AS bucket "
        "FROM exact"
        for j in range(_CMS_D)
    )
    return f"""
    WITH x AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    exact AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY tok
    ),
    total AS (SELECT SUM(cnt) AS n FROM exact),
    hashed AS ({rows}),
    sketch AS (
      SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS bsum
      FROM hashed GROUP BY j, bucket
    ),
    est AS (
      SELECT h.tok, MIN(s.bsum) AS cms_count
      FROM hashed h JOIN sketch s ON s.j = h.j AND s.bucket = h.bucket
      GROUP BY h.tok
    )
    SELECT e.tok, e.cnt AS exact_count,
           CAST(est.cms_count AS BIGINT) AS cms_count,
           CAST(est.cms_count - e.cnt AS BIGINT) AS overcount
    FROM exact e JOIN est ON est.tok = e.tok, total
    WHERE e.cnt * 1000 >= total.n * 3
    """


@query("sketch_count_min", oracle=_cms_oracle())
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    2005) over corpus tokens — the fixed-memory (d=4 x w=512 counters
    here; size w ~ e/eps for real streams) frequency table used when
    the vocabulary itself cannot be held: estimate(t) = min over hash
    rows of the bucket sum t lands in, always >= the true count, with
    the overcount bounded by n/w per row.  Output: every heavy token
    (>=0.3% share, the `text_heavy_hitters` bar) with its exact count,
    CMS estimate, and overcount — so the one-sided-error contract is
    hash-checked, not asserted.  The hash family is the first 4 hex
    digits of md5(row_salt || token) — cross-engine-identical down to
    UTF-8 byte order, so the DuckDB oracle reproduces every bucket sum
    and every min exactly.

    Plan shape: explode -> (token) count (the weighted stream), then
    ALL sketch arithmetic on the vocabulary-sized frame: a 4-way
    salted-hash melt, a (j,bucket) aggregate to d x w = 2048 rows, and
    a join back for the min.  At 100 TB the sketch side is O(d x w)
    and broadcasts; nothing after the first count touches corpus-sized
    data.  (The two-phase Misra-Gries exact tier is
    `text_heavy_hitters`; this is the mergeable-counter alternative a
    streaming rollup keeps per window.)"""
    d = table(spark, sf_dir, "documents")
    x = d.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = (
        x.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .transform(truncate)  # feeds the melt, the join-back, and total
    )
    total = exact.agg(F.sum("cnt").alias("n"))
    hashed = exact.select(
        "tok",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cms_bucket_sql("tok", j)).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("h"),
    ).select("tok", "cnt", F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
    sketch = hashed.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("bsum")
    )
    est = (
        hashed.join(sketch, ["j", "bucket"])
        .groupBy("tok")
        .agg(F.min("bsum").alias("cms_count"))
    )
    return (
        exact.join(est, "tok")
        .crossJoin(total)
        .filter(F.col("cnt") * 1000 >= F.col("n") * 3)
        .select(
            "tok",
            F.col("cnt").alias("exact_count"),
            F.col("cms_count").cast("bigint").alias("cms_count"),
            (F.col("cms_count") - F.col("cnt")).cast("bigint").alias("overcount"),
        )
    )
