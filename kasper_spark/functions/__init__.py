"""Scalar/aggregate function helpers shared by operators."""

from kasper_spark.functions.exact import dsum, davg

__all__ = ["dsum", "davg"]
