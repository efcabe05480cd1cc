"""Shared column-expression helpers used across declared queries."""

from kinesis_handler_spark.functions.numeric import dec, dec_sum_as_double

__all__ = ["dec", "dec_sum_as_double"]
