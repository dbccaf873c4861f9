from prajna_spark.functions.rounding import R, pround

__all__ = ["R", "pround"]
