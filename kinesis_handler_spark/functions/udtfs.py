"""Python UDTF surface (SURVEY.md §2.B "UDF / UDAF / UDTF").

The reference's handlers can emit any shape they like from one record
(`/root/reference/lib/kinesisHandler.js:89,118` — a handler is an
arbitrary callback); the relational equivalents of 1-row→N-rows are
`explode`/`posexplode` (used throughout the query layer) and, for
genuinely imperative expansions, Spark's arrow-optimized Python UDTF.

Keep UDTFs OUT of hot paths: a UDTF is a per-partition Python loop.
Everything expressible as `explode`/`transform` stays JVM-side; the
UDTF below exists to cover the API surface with a real, tested
example — expanding a document into (pos, token, is_stop) rows with
imperative per-row logic.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="pos int, token string, is_stop boolean")
class TokenizeUDTF:
    """1 row → N rows: whitespace-tokenize ``text``, emitting position,
    token, and a stopword flag.  ``eval`` runs once per input row;
    yields become output rows."""

    STOP = frozenset({"the", "a", "of", "and", "or", "to", "in", "is"})

    def eval(self, text: str):  # noqa: D102 - see class docstring
        if text is None:
            return
        for pos, token in enumerate(text.split()):
            yield pos, token, token in self.STOP


def tokenize_udtf_table(spark, text: str):
    """Run the UDTF over a literal (lateral-join form is exercised in
    tests via SQL): returns a DataFrame of (pos, token, is_stop)."""
    return TokenizeUDTF(lit(text))


def register_udtfs(spark) -> None:
    """Register UDTFs for SQL use: ``SELECT t.* FROM docs, LATERAL
    tokenize(text) AS t`` — the lateral-join shape Catalyst plans as a
    Generate over each row."""
    spark.udtf.register("tokenize", TokenizeUDTF)
