"""Exact-arithmetic helpers for cross-engine-deterministic aggregates.

Summing doubles is order-dependent; Spark's partitioned partial
aggregation visits rows in a different order than any single-threaded
oracle, so double SUMs disagree in the last ulps.  Casting the input to
DECIMAL first makes the arithmetic exact and therefore order-independent
— the same trick the oracle SQL applies, so hashes match bit-for-bit.

The fixture data carries at most 2 fractional digits (TPC-H-style money);
DECIMAL(18,6) is wide enough for any per-row value and sums stay inside
DECIMAL(38,6).

Final OUTPUT columns are DOUBLE, not decimal: the arithmetic stays exact
(order-independent) inside the aggregate, and the single deterministic
decimal→double conversion at the end produces a value both Spark and any
oracle engine agree on bit-for-bit.  Surfacing decimal(38,6) itself is a
trap — downstream consumers (hashers, Arrow, BI tools) disagree on
decimal representations even when values are equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
DEC_SUM = "decimal(38,6)"


def dec(col: Column | str) -> Column:
    """Cast a (double) column to exact decimal for order-independent sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dec_sum(col: Column | str) -> Column:
    """Exact SUM over a double column (decimal internally), surfaced as
    DOUBLE via one deterministic final conversion."""
    return F.sum(dec(col)).cast("double")


# Back-compat alias; both names now surface double.
dec_sum_as_double = dec_sum
