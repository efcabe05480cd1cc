"""Shared text-operator building blocks.

One definition each for the expressions several declared queries build
on: if these drift per-call-site, the MinHash candidate tier silently
de-synchronizes from the exact Jaccard tier it is recall-tested
against, and the composed corpus-prep pipeline from the standalone
normalize operator.  (Round-5 review finding: four hand-maintained
copies of the n-gram construction, two of the normalizer.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_ngrams(arr: Column | str, n: int) -> Column:
    """Array of n-word shingles (single-space joined) over a token-array
    column.  Callers filter ``F.size(arr) >= n`` first — on a shorter
    array ``sequence(0, size-n)`` would run backwards.  Pure JVM
    higher-order transform: per-row, no shuffle."""
    col = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(
        F.sequence(F.lit(0), F.size(col) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(col, i + k) for k in range(1, n + 1)]
        ),
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical corpus normalization: lowercase, strip combining
    marks, strip non-[a-z0-9 ], collapse runs of spaces, trim.

    The combining-mark strip (``\\p{M}``) runs BETWEEN lower() and the
    character-class replace: the engines' case mappings disagree on
    marked letters (Java's lower('İ') is "i"+U+0307 while DuckDB's is
    plain "i" — found by the unicode parity twin), and removing marks
    collapses both spellings to the same string.  ASCII-only class for
    the keep-set so case mapping of kept characters is engine-
    independent; both engines' regexp_replace replace ALL matches.
    The oracle-SQL mirror of this expression lives in the queries that
    use it (`text_normalize`, `pipeline_corpus_prep`,
    `source_text_scan`, corpus ops) and must change in lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(c), r"\p{M}", ""),
                "[^a-z0-9 ]",
                " ",
            ),
            " +",
            " ",
        )
    )
