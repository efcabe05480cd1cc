"""Totality on OUTLIER-SIZED documents: the text/corpus/dedup operator
families must execute when a handful of documents are multi-megabyte —
the shape a real web corpus always contains (concatenated logs, book
dumps, minified bundles).

Why this matters at 100 TB: token-explode operators multiply per-row
work by document length.  A 2 MB document explodes to ~300k shingles /
tokens in one task; an operator that buffers per-document state
carelessly (collect_list of all shingles, quadratic per-doc regex) dies
on the outlier even though the corpus average is 1 kB.  This suite pins
EXECUTION (values are owned by the oracle suite; these texts are
well-formed, just huge).

Fixture: real sf0.001 tables, with documents gaining 3 synthetic rows of
~2 MB each (repeated natural-ish token stream, so shingling/BPE/minhash
do real work rather than collapsing to one token).
"""

from __future__ import annotations

import os

import pytest

from kinesis_handler_spark.registry import QUERIES, all_queries

_BIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".fixture_cache",
    "sf_bigdoc",
)

# Every declared query that consumes documents.text (text analysis,
# dedup, corpus statistics, chunking, fingerprints, heavy hitters).
_ALL = all_queries()  # registration side effect populates QUERIES
_TEXT_QUERIES = sorted(
    name
    for name, q in QUERIES.items()
    if "documents" in (q.oracle or "") or name.startswith(
        ("text_", "dedup_", "contamination", "pipeline_corpus")
    )
)


@pytest.fixture(scope="session")
def bigdoc_dir(spark) -> str:
    from pyspark.sql import functions as F

    from kinesis_handler_spark.tables import TABLES

    marker = os.path.join(_BIG_DIR, "_TWIN_COMPLETE")
    if not os.path.exists(marker):
        src = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        words = [
            "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
            "golf", "hotel", "india", "juliet", "kilo", "lima",
        ]
        for name in TABLES:
            raw = spark.read.parquet(f"{src}/{name}.parquet")
            df = raw
            if name == "documents":
                # ~2 MB each: 300k tokens with rotating offsets so the
                # shingle/minhash space is rich, not one repeated 3-gram
                rows = []
                for k in range(3):
                    toks = [
                        words[(i * (k + 7) + i // 12) % len(words)]
                        for i in range(300_000)
                    ]
                    text = " ".join(toks)
                    rows.append((950_000 + k, text, len(text), "en", "big"))
                big = spark.createDataFrame(
                    rows,
                    "doc_id BIGINT, text STRING, n_chars INT, "
                    "lang STRING, source STRING",
                )
                # align column types with the source file
                big = big.select(
                    *[
                        F.col(c).cast(dict(raw.dtypes)[c]).alias(c)
                        for c in raw.columns
                    ]
                )
                df = raw.limit(50).unionByName(big)
            else:
                df = raw.limit(50)
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(_BIG_DIR, f"{name}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return _BIG_DIR


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_text_query_total_on_megabyte_docs(spark, bigdoc_dir, name):
    df = all_queries()[name](spark, bigdoc_dir)
    assert df.count() >= 0
