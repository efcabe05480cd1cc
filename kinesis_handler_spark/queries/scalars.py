"""Scalar function library, exercised via declared queries.

SURVEY.md §2.B "Scalar function library".  Cross-engine determinism:
string/date/integer ops are exact; float ops restricted to IEEE-exact
(+,-,*,/,sqrt) or integer-valued results.  Functions whose return type
differs between engines (floor, year, datediff, ...) are cast to a
common type on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "scalar_string",
    oracle="""
    SELECT
      c_custkey,
      upper(c_mktsegment)                    AS seg_upper,
      lower(c_name)                          AS name_lower,
      substr(c_name, 1, 8)                   AS name_prefix,
      c_name || '/' || c_mktsegment          AS name_seg,
      CAST(length(c_name) AS INTEGER)        AS name_len,
      trim('  ' || c_mktsegment || ' ')      AS seg_trim,
      regexp_extract(c_name, '([0-9]+)', 1)  AS name_digits,
      replace(c_name, 'Customer#', 'C-')     AS name_short,
      array_to_string(string_split(c_name, '#'), '|') AS name_parts
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/length/trim/regexp_extract/replace/split.

    ``name_parts`` is split then re-joined with ``|``: the split is still
    exercised, but the output column is a plain string — array-typed
    outputs are not hashable by the driver's canonicalizer."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        # F.concat (not concat_ws): || is NULL-propagating on both
        # engines, concat_ws silently skips NULL parts.
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias(
            "name_seg"
        ),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"Customer#", "C-").alias("name_short"),
        F.array_join(F.split("c_name", "#"), "|").alias("name_parts"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate)  AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      CAST(day(o_orderdate)   AS INTEGER) AS order_day,
      CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
      date_trunc('month', o_orderdate) AS order_month_start,
      CASE WHEN o_orderdate <= DATE '9999-12-01'
           THEN CAST(o_orderdate + INTERVAL 30 DAY AS DATE) END AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
           AS INTEGER) AS days_since_epoch_start,
      CAST(epoch(o_orderdate) AS BIGINT) AS order_unix
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/date_trunc/date_add/datediff/unix_timestamp.

    DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday —
    oracle adds 1.  All timestamps are midnight-aligned so day diffs are
    unambiguous.

    ``due_date`` NULLs past the calendar ceiling (r7 times-twin find):
    9999-12-31 + 30 days is year 10000, which both engines compute
    internally but neither can surface through the Python/Arrow date
    bridge (datetime.date caps at 9999) — the driver collect would
    crash on legal input.  NULL-as-unrepresentable is the engine's
    standing rule (registry docstring: out-of-range doubles, NaN)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    due_ok = F.col("o_orderdate").cast("date") <= F.lit("9999-12-01").cast(
        "date"
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        # date_trunc promotes the NTZ input to tz-aware TIMESTAMP; cast
        # back to NTZ because the tz-aware Python bridge
        # (datetime.fromtimestamp) probes ±1 day for DST folds and
        # raises "year 0 is out of range" for instants within a day of
        # the 0001-01-01 calendar floor — the NTZ bridge converts via
        # epoch arithmetic and covers the whole calendar (r7
        # extreme-date twin find).  Session TZ is pinned UTC, so the
        # cast is value-preserving.
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("order_month_start"),
        F.when(
            due_ok, F.date_add(F.col("o_orderdate").cast("date"), 30)
        ).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("order_unix"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      abs(l_quantity - 25.0)                        AS qty_dev,
      CAST(ceil(l_extendedprice / 1000.0)  AS BIGINT) AS price_k_ceil,
      CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
      round(l_discount * 100.0, 0)                  AS disc_pct,
      sqrt(l_extendedprice)                         AS price_sqrt,
      pow(2.0, CAST(l_linenumber AS DOUBLE))        AS two_pow_line,
      ((l_orderkey % 7) + 7) % 7                    AS key_mod7,
      CAST(greatest(l_quantity, 10.0) AS DOUBLE)    AS qty_floor10,
      CAST(least(l_quantity, 40.0)    AS DOUBLE)    AS qty_cap40
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/round/sqrt/pow/pmod/greatest/least.  sqrt and pow
    with integer exponents are IEEE-exact; round operates off .5
    boundaries (discount grid is exact-centesimal)."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
        F.round(F.col("l_discount") * 100.0, 0).alias("disc_pct"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow(F.lit(2.0), F.col("l_linenumber").cast("double")).alias("two_pow_line"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.least(F.col("l_quantity"), F.lit(40.0)).alias("qty_cap40"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT
      vec_id,
      CAST(len(embedding) AS INTEGER) AS dim,
      CAST(embedding[1] AS DOUBLE)    AS first_val,
      CAST(list_slice(embedding, 1, 4)[4] AS DOUBLE) AS head4_last,
      CAST(list_sort(list_slice(embedding, 1, 4))[1] AS DOUBLE) AS head4_min,
      list_contains(list_transform(embedding, x -> x > 0.4), true)
        AS has_large
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/sort_array/exists over ArrayType — all
    higher-order functions run JVM-side (no Python).

    slice/sort_array are exercised but surfaced as scalar DOUBLEs
    (last-of-slice, min-of-slice): array-typed outputs crash the
    driver's hasher, and float→string serialization is engine-dependent;
    float→double widening is exact in both engines."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    # try_element_at, not element_at: ANSI element_at RAISES on an
    # out-of-bounds index (a short/empty vector from a failed embed
    # job), while DuckDB's list indexing yields NULL — try_element_at
    # matches that and keeps the query total on dirty data.
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("first_val"),
        F.try_element_at(F.slice("embedding", 1, 4), F.lit(4))
        .cast("double")
        .alias("head4_last"),
        F.try_element_at(F.sort_array(F.slice("embedding", 1, 4)), F.lit(1))
        .cast("double")
        .alias("head4_min"),
        F.exists("embedding", lambda x: x > F.lit(0.4)).alias("has_large"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(unnest(generate_series(1, len(embedding))) AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 8
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF-shaped: 1 row → N rows); positions 1-based to
    match the oracle's parallel-unnest zip."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val0")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("val0").cast("double").alias("val"),
    )


@query(
    "scalar_map_json",
    oracle="""
    SELECT event_id,
           CASE WHEN ok AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k_value,
           CASE WHEN ok THEN json_keys(props)[1] END AS first_key
    FROM (
      SELECT event_id, props,
             coalesce(list_aggregate(list_transform(json_keys(props), kk ->
                 json_type(props, '$."' || kk || '"')
                   IN ('BIGINT', 'UBIGINT', 'NULL')
                 AND (json_type(props, '$."' || kk || '"') = 'NULL'
                      OR TRY_CAST(json_extract_string(props, '$."' || kk || '"')
                                  AS BIGINT) IS NOT NULL)),
               'bool_and'), TRUE) AS ok
      FROM events
      WHERE event_id % 9 = 0
    ) x
    """,
)
def scalar_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string → MapType via from_json; map_keys/element access.
    (Reference analogue: the JSON.parse step, kinesisHandler.js:171.)

    Typed-parse contract (r7 hostile-JSON twin): ``from_json`` with
    ``map<string,bigint>`` is all-or-nothing — ONE value that is not an
    int64-representable JSON integer (a float, a quoted number, a
    nested object, a beyond-int64 magnitude, 1e400) NULLs the whole
    map, while JSON-null values are allowed inside an otherwise valid
    map.  The oracle replays exactly that via json_keys +
    per-key json_type (bracket-quoted paths, so a '"k": 123' decoy
    inside a string value cannot fool it; keys containing a double
    quote are out of contract).  First-key access uses ``F.get`` — the
    ANSI ``[0]`` on an EMPTY map's key array raises
    INVALID_ARRAY_INDEX, which the empty-object payload triggered.
    Duplicate-key objects are interop-undefined (RFC 8259) and
    excluded, as in ``json_extract_props``."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        m.getItem("k").alias("k_value"),
        F.get(F.map_keys(m), F.lit(0)).alias("first_key"),
    )


@query(
    "scalar_conditional_null",
    oracle="""
    SELECT
      c_custkey,
      coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
      CASE WHEN c_acctbal < 0 THEN 'neg'
           WHEN c_acctbal < 5000 THEN 'low'
           ELSE 'high' END AS bal_class,
      nullif(c_nationkey, 0) AS nation_or_null,
      coalesce(CAST(NULL AS DOUBLE), c_acctbal, 0.0) AS bal_nvl,
      (c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL) AS is_complete
    FROM customer
    WHERE c_custkey % 3 = 0
    """,
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/when-otherwise/null predicates."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_or_null"),
        F.coalesce(F.lit(None).cast("double"), F.col("c_acctbal"), F.lit(0.0)).alias(
            "bal_nvl"
        ),
        (F.col("c_acctbal").isNotNull() & F.col("c_mktsegment").isNotNull()).alias(
            "is_complete"
        ),
    )


@query(
    "scalar_struct",
    oracle="""
    SELECT c_custkey,
      (struct_pack(seg := c_mktsegment, bal := c_acctbal)).seg AS seg,
      (struct_pack(cust := struct_pack(seg := c_mktsegment, bal := c_acctbal),
                   nk := c_nationkey)).cust.bal AS bal,
      (struct_pack(nk := c_nationkey)).nk + 100 AS nk_plus,
      CASE WHEN (struct_pack(seg := c_mktsegment, bal := c_acctbal)).bal > 0.0
           THEN 'pos' ELSE 'nonpos' END AS bal_sign
    FROM customer
    WHERE c_custkey % 5 = 0
    """,
)
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType column surface: create (``F.struct`` with named
    fields), nest two levels, access via ``getField``/dot path, and
    branch on a struct member.  Struct columns never reach the output
    (driver-unhashable) — every struct is consumed back down to
    scalars, the same discipline the routing engine applies to its
    envelope structs.  Pure projection: no shuffle, whole-stage
    codegen, columns pruned to the 4 referenced fields."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    flat = F.struct(
        F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")
    )
    nested = F.struct(flat.alias("cust"), F.col("c_nationkey").alias("nk"))
    return c.select(
        "c_custkey",
        flat.getField("seg").alias("seg"),
        nested.getField("cust").getField("bal").alias("bal"),
        (nested.getField("nk") + 100).alias("nk_plus"),
        F.when(flat.getField("bal") > 0.0, "pos")
        .otherwise("nonpos")
        .alias("bal_sign"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                         AS name_md5,
           sha256(c_name || '/' || c_mktsegment) AS keyed_sha,
           substr(md5(c_name), 1, 8)           AS md5_prefix
    FROM customer
    WHERE c_custkey % 3 = 0
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (md5 / sha2-256) — the content-
    addressing primitives under exact dedup and shuffle-key shrinking
    (`dedup_exact`'s 100 TB note).  Both engines emit lowercase hex, so
    digests are hash-checkable strings.  Pure projection, codegen,
    no shuffle."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(
            F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")), 256
        ).alias("keyed_sha"),
        F.substring(F.md5(F.col("c_name")), 1, 8).alias("md5_prefix"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           -- Spark's shiftleft wraps like the machine (two's-complement
           -- mod 2^64); DuckDB's << RAISES on int64 overflow, so the
           -- oracle reproduces the wrap through a HUGEINT intermediate
           -- (r7 extreme-key twin find).  Identical to (l_orderkey << 3)
           -- wherever that doesn't overflow.
           CAST((((CAST(l_orderkey AS HUGEINT) * 8)
                   % 18446744073709551616
                  + 18446744073709551616 + 9223372036854775808)
                 % 18446744073709551616)
                - 9223372036854775808 AS BIGINT)      AS key_shl,
           (l_orderkey >> 1)                          AS key_shr,
           CAST(l_orderkey & 255 AS BIGINT)           AS key_low_byte,
           CAST(l_orderkey | 4096 AS BIGINT)          AS key_or,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS key_xor,
           CAST(bit_count(l_orderkey) AS INTEGER)     AS key_popcount,
           ~l_orderkey                                AS key_not
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (shifts, and/or/xor, popcount,
    complement) on 64-bit keys — the machinery of the engine's own
    simhash/LSH operators, exposed as scalars.  Two's-complement BIGINT
    semantics are identical across engines; results cast to a common
    width where default return types differ (DuckDB bit_count →
    TINYINT, Spark → INT)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft(k, 3).alias("key_shl"),
        F.shiftright(k, 1).alias("key_shr"),
        (k.bitwiseAND(F.lit(255))).cast("bigint").alias("key_low_byte"),
        (k.bitwiseOR(F.lit(4096))).cast("bigint").alias("key_or"),
        (k.bitwiseXOR(F.col("l_partkey"))).cast("bigint").alias("key_xor"),
        F.bit_count(k).cast("int").alias("key_popcount"),
        F.bitwise_not(k).alias("key_not"),
    )


@query(
    "scalar_regex_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS parsed_key,
           (CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) = c_custkey)
             AS key_consistent
    FROM customer
    """,
)
def scalar_regex_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-based PII-style redaction: mask every digit in the
    customer name, extract the embedded numeric id, and cross-check it
    against the key column — the anonymize-and-audit pattern every
    compliance pipeline runs before text lands in a training corpus.

    Pure JVM regex expressions fused into the scan (Spark replaces all
    matches by default; DuckDB needs the 'g' flag — the oracle says so
    explicitly).  Patterns stick to character classes + groups, which
    Java and RE2 regex dialects interpret identically.  Stateless
    per-row transform: scan-speed at any corpus size, no shuffle."""
    c = table(spark, sf_dir, "customer")
    digits = F.regexp_extract("c_name", r"([0-9]+)", 1)
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked_name"),
        digits.cast("bigint").alias("parsed_key"),
        (digits.cast("bigint") == F.col("c_custkey")).alias("key_consistent"),
    )
