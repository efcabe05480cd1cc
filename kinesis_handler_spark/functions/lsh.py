"""LSH bucket-width capping (r9 verdict ask #5).

On a replication-heavy corpus an LSH band bucket can grow enormous
(the sf1.0 scale probe measured a 5,485-member bucket; GROWTH_r09
measured candidate-pair growth at exponent 1.74 on the tiled corpus),
and pair emission inside a bucket is quadratic in its width.  Real
dedup systems bound this with per-bucket caps (Lee et al. 2021 cap
bucket width and flag the stop-pattern buckets); this module is that
guard for every banded candidate generator in the engine.

Semantics: members of each bucket are ranked by a deterministic total
key; only the first ``cap`` members participate in pair emission, so a
bucket emits at most cap·(cap−1)/2 candidate pairs no matter how wide
it gets.  Truncation is NEVER silent: ``truncated`` is a lazy frame
flagging every capped bucket with its true width (the no-silent-caps
rule) — an ops audit or pytest gate evaluates it; the hot path pays
nothing for it (shared lazy lineage).

Recall trade-off (documented, gated in tests/test_scale_ops.py):
members ranked past ``cap`` emit no pairs from that bucket — they can
still be caught by their other bands (an LSH member has n_bands
independent chances), and in a truncated bucket the kept members still
pair among themselves, so the duplicate MASS of a replication blowup is
found even though individual tail members may be missed.  A bucket
wider than ``cap`` is almost always a degenerate/boilerplate pattern,
not a real near-dup group — exactly the rows a quality pipeline wants
flagged rather than pairwise-enumerated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default member cap per band bucket: 64 members = at most 2,016 pairs
#: per bucket.  Wide enough that NO bucket in the clean corpora is
#: truncated at sf0.01/sf0.1 (golden pins unchanged — verified by
#: tools/make_golden.py dry run) while bounding the tiled-corpus
#: blowup; pair emission is capped at ~2k instead of the 15M a
#: 5,485-member bucket would emit.
BUCKET_CAP = 64


def cap_band_buckets(
    banded: DataFrame,
    order_col: str | Column,
    bucket_cols: tuple[str, ...],
    cap: int = BUCKET_CAP,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(capped, truncated)``: ``capped`` is ``banded`` minus
    every bucket member ranked past ``cap`` (rank by ``order_col``
    within ``bucket_cols`` — pass a TOTAL key so the kept set is
    deterministic); ``truncated`` flags each over-wide bucket with its
    true width and the emitted member count.

    Plan shape: the rank-filter compiles to WindowGroupLimit, so each
    shuffle partition pre-prunes to its local top-``cap`` BEFORE the
    full sort — the stop-pattern bucket never materializes its tail on
    one task.  The window shuffle keys match the candidate join's keys,
    so the join reuses the exchange."""
    w = Window.partitionBy(*bucket_cols).orderBy(order_col)
    ranked = banded.withColumn("_bucket_rn", F.row_number().over(w))
    capped = ranked.filter(F.col("_bucket_rn") <= cap).drop("_bucket_rn")
    truncated = (
        ranked.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("width"))
        .filter(F.col("width") > cap)
        .withColumn("emitted", F.lit(cap).cast("bigint"))
    )
    return capped, truncated
