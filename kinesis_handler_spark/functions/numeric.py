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

# Largest |value| that safely casts to DECIMAL(18,6) (12 integer
# digits; one below the bound so scale-6 rounding can never tip it
# over).  Finite doubles beyond it would RAISE under ANSI
# (NUMERIC_VALUE_OUT_OF_RANGE) — unlike NaN/Inf, which the cast maps to
# NULL — so one corrupt 1e308 reading would kill the whole aggregate.
_DEC_SAFE = 999999999999.0


def dec_t(col: Column | str, typ: str = DEC) -> Column:
    """Cast a (double) column to exact decimal of type ``typ`` for
    order-independent sums.  Total on dirty data: NaN/±Inf/out-of-range
    magnitudes become NULL (undecodable measurements, skipped by SUM —
    the same semantics ANSI already gives non-finite values), instead
    of an ANSI cast error four hours into a 100 TB job.  The magnitude
    guard derives from the target type's integer digits (one below, so
    scale rounding can never tip a value over); fixture domains sit far
    below it, so clean-data plans and values are unchanged."""
    prec, scale = map(int, typ[typ.index("(") + 1 : -1].split(","))
    bound = float(10 ** (prec - scale) - 1)
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    return F.when(~F.isnan(d) & (F.abs(d) < F.lit(bound)), c).cast(typ)


def dec(col: Column | str) -> Column:
    """Bounded cast to the default DECIMAL(18,6) — see :func:`dec_t`."""
    return dec_t(col, DEC)


def dec_sum(col: Column | str) -> Column:
    """Exact SUM over a double column (decimal internally), surfaced as
    DOUBLE via one deterministic final conversion."""
    return F.sum(dec(col)).cast("double")


def floor_sum(col: Column, *, zero_if_null: bool = False) -> Column:
    """Exact decimal SUM, FLOOR-quantized to DECIMAL(38,0) before ONE
    integer→double conversion — the 2⁵³ rule (registry.py): a plain
    decimal→double cast drifts 1-2 ULPs between engines once the sum's
    integer representation (value × 10^scale) crosses 2⁵³, because
    Spark rounds the exact BigDecimal while DuckDB converts int128 then
    divides.  FLOOR + integer→double is single-rounded at ANY
    magnitude.  Use for every sum whose group cardinality is BOUNDED
    (global / per-year / per-nation / per-flag totals grow linearly
    with corpus size; per-entity sums whose entity count grows with the
    corpus stay bounded and don't need this).  Oracle mirror:
    ``CAST(CAST(FLOOR(SUM(...)) AS DECIMAL(38,0)) AS DOUBLE)`` (wrap in
    COALESCE(..., 0) when ``zero_if_null``)."""
    s = F.floor(F.sum(col)).cast("decimal(38,0)")
    if zero_if_null:
        s = F.coalesce(s, F.lit(0).cast("decimal(38,0)"))
    return s.cast("double")


# Back-compat alias; both names now surface double.
dec_sum_as_double = dec_sum
