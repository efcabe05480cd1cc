"""Totality on NULL-riddled input: every declared query must EXECUTE
against a twin corpus where rows carry NULLs in every non-leading
column — including NULL text, NULL embeddings, and NULL join keys.

Why this matters at 100 TB: real corpora are dirty.  A failed upstream
embed job writes NULL vectors; a scraper writes NULL text; a malformed
event has a NULL key.  One such row must not kill a 1000-executor job —
an operator either processes it or (documented, e.g. undecodable-row
drop) filters it, but it never raises.

The twin is built from real sf0.001 rows (so every query still sees
plausible data) plus, per table, five rows with all non-leading columns
NULLed and three rows entirely NULL.  Values are NOT pinned here — the
oracle suite owns values (and its determinism rules require impl and
oracle to agree on NULL handling); this suite pins execution only.
"""

from __future__ import annotations

import os

import pytest

from kinesis_handler_spark.registry import all_queries

_NULLS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".fixture_cache",
    "sf_nulls",
)

_QUERIES = all_queries()


@pytest.fixture(scope="session")
def nulls_dir(spark) -> str:
    from pyspark.sql import functions as F

    from kinesis_handler_spark.tables import TABLES

    marker = os.path.join(_NULLS_DIR, "_TWIN_COMPLETE")
    if not os.path.exists(marker):
        src = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        for name in TABLES:
            raw = spark.read.parquet(f"{src}/{name}.parquet")
            cols = raw.columns
            base = raw.limit(20)
            partial = base.limit(5).select(
                cols[0],
                *[
                    F.lit(None).cast(dict(raw.dtypes)[c]).alias(c)
                    for c in cols[1:]
                ],
            )
            full = base.limit(3).select(
                *[
                    F.lit(None).cast(dict(raw.dtypes)[c]).alias(c)
                    for c in cols
                ]
            )
            base.unionByName(partial).unionByName(full).coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(_NULLS_DIR, f"{name}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return _NULLS_DIR


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_total_on_null_input(spark, nulls_dir, name):
    df = _QUERIES[name](spark, nulls_dir)
    n = df.count()
    assert n >= 0


# Every query that consumes the embeddings table, kernel- or JVM-side.
_VECTOR_QUERIES = [
    "dedup_embedding_cosine",
    "dedup_embedding_ann",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivf_search",
    "embed_quantize",
    "embed_random_projection",
    "sim_cosine_topk",
    "embed_vector_stats",
    "scalar_array",
    "scalar_array_explode",
]


@pytest.fixture(scope="session")
def ragged_dir(spark) -> str:
    """Twin corpus whose embeddings table carries RAGGED vectors: an
    empty array, a wrong-dimension array, and a vector with a NULL
    element — the shapes a failed/partial embed job emits.  The numpy
    kernels np.stack fixed-dimension matrices, so any one of these
    kills an unguarded job; the contract (``_clean_embeddings``) is to
    drop rows that violate the table's declared EMBEDDING_DIM."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.tables import TABLES

    out = os.path.join(
        os.path.dirname(_NULLS_DIR), "sf_ragged"
    )
    marker = os.path.join(out, "_TWIN_COMPLETE")
    if not os.path.exists(marker):
        src = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        for name in TABLES:
            raw = spark.read.parquet(f"{src}/{name}.parquet")
            if name == "embeddings":
                base = raw.limit(30)
                bad = base.limit(3).select(
                    (F.col("vec_id") + 900000).alias("vec_id"),
                    F.expr(
                        "CASE vec_id % 3"
                        "  WHEN 0 THEN CAST(array() AS ARRAY<FLOAT>)"
                        "  WHEN 1 THEN slice(embedding, 1, 32)"
                        "  ELSE transform(embedding,"
                        "       (x, i) -> IF(i = 5, CAST(NULL AS FLOAT), x))"
                        " END"
                    ).alias("embedding"),
                    "label",
                )
                raw = base.unionByName(bad)
            raw.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out, f"{name}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


@pytest.mark.parametrize("name", _VECTOR_QUERIES)
def test_vector_query_total_on_ragged_embeddings(spark, ragged_dir, name):
    df = _QUERIES[name](spark, ragged_dir)
    assert df.count() >= 0


@pytest.fixture(scope="session")
def nan_dir(spark) -> str:
    """Twin corpus where floating-point columns carry NaN / +Inf / -Inf
    — corrupt-sensor values a 100 TB lake WILL contain.  Spark's ANSI
    double→decimal cast maps non-finite to NULL (so the exact-decimal
    aggregates treat them as undecodable measurements and skip them);
    this twin pins that every query at least EXECUTES on them."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.tables import TABLES

    out = os.path.join(os.path.dirname(_NULLS_DIR), "sf_nan")
    marker = os.path.join(out, "_TWIN_COMPLETE")
    if not os.path.exists(marker):
        src = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NaN/Inf (ANSI casts map them to NULL) plus EXTREME FINITE
        # magnitudes: 1e308 is a legal double a corrupt sensor can emit,
        # and floor()/long-conversion of it overflows under ANSI.
        # ±2e14: finite, inside the ±1e308 decimal guard, but
        # floor(x/50000) lands outside INT range on BOTH signs — pins
        # agg_histogram's symmetric magnitude clamp (ADVICE r5: the old
        # one-sided least(...,9) clamp let -2e14 raise on the int cast).
        specials = ["double('NaN')", "double('Infinity')",
                    "double('-Infinity')", "double('1.0E308')",
                    "double('-1.0E308')", "double('2.0E14')",
                    "double('-2.0E14')"]
        for name in TABLES:
            raw = spark.read.parquet(f"{src}/{name}.parquet")
            base = raw.limit(20)
            dtypes = dict(raw.dtypes)
            bad = []
            for k, special in enumerate(specials):
                row = base.limit(k + 1).subtract(base.limit(k)).select(
                    *[
                        F.expr(special).cast("double").alias(c)
                        if dtypes[c] == "double"
                        else F.expr(
                            f"transform({c}, x -> CAST({special} AS FLOAT))"
                        ).alias(c)
                        if dtypes[c] == "array<float>"
                        else F.col(c)
                        for c in raw.columns
                    ]
                )
                bad.append(row)
            df = base
            for b in bad:
                df = df.unionByName(b)
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out, f"{name}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_total_on_nonfinite_floats(spark, nan_dir, name):
    df = _QUERIES[name](spark, nan_dir)
    assert df.count() >= 0
