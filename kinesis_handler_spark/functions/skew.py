"""Skew mitigation: salted joins and salted distinct aggregation.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on in
``session.py``) handles most skew at runtime by splitting oversized
partitions — these helpers cover the two cases AQE can't:

* a *hot key* whose single key-group exceeds one task even after
  splitting (salted join: replicate the build side across salts so the
  hot key's rows spread over ``n_salt`` tasks);
* *count-distinct state skew*, where one group accumulates a huge
  distinct set (salted two-stage: the salt is derived from the distinct
  column itself, so every distinct value lands in exactly one salt
  bucket and per-bucket counts add up exactly).

Both are algebraic rewrites — results are identical to the unsalted
plan; only the shuffle layout changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys and ``small`` is too
    large to broadcast: salt the big side (uniform spread of each hot
    key over ``n_salt`` sub-keys) and replicate the small side once per
    salt, then join on (keys + salt). The shuffle for a hot key becomes
    ``n_salt`` tasks instead of one straggler.

    The big side's salt comes from ``xxhash64`` over its whole row —
    deterministic, and uniform within a hot key as long as rows differ
    anywhere outside the join key. Cost: ``n_salt``× shuffle volume for
    the small side — pick the smallest ``n_salt`` that flattens the
    stragglers.

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported:
    the rewrite replicates the small side once per salt, so any join
    type that emits unmatched SMALL-side rows (``right``/``full``)
    would emit them ``n_salt`` times — algebraically wrong, rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got "
            f"{how!r}: replicating the small side across salts would "
            f"duplicate its unmatched rows under right/full joins"
        )
    on = list(on)
    salted_big = big.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    replicated_small = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(SALT, F.col(SALT).cast("long"))
    return salted_big.join(replicated_small, on + [SALT], how).drop(SALT)


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    *,
    n_salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group for groups whose distinct set
    is too large for one task's aggregation state.

    Stage 1 groups by (keys, salt(x)) — each distinct value of ``x``
    belongs to exactly one salt bucket, so bucket-level distinct counts
    are disjoint; stage 2 sums them. Same two-shuffle shape Spark uses
    for its own distinct-aggregate rewrite, but with an explicit salt
    key that caps per-task state at |distinct|/n_salt.
    """
    group_cols = list(group_cols)
    stage1 = (
        df.withColumn(SALT, F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt)))
        .groupBy(*group_cols, SALT)
        .agg(F.count_distinct(F.col(distinct_col)).alias("__partial"))
    )
    return stage1.groupBy(*group_cols).agg(
        F.sum("__partial").alias(out_col)
    )


def with_salt(df: DataFrame, n_salt: int, from_col: str | None = None) -> DataFrame:
    """Attach a deterministic salt column (building block for custom
    salted pipelines): hash of ``from_col`` if given, else of the whole
    row."""
    src: list[Column] = (
        [F.col(from_col)] if from_col else [F.col(c) for c in df.columns]
    )
    return df.withColumn(SALT, F.pmod(F.xxhash64(*src), F.lit(n_salt)))
