"""Distributed operators that need more than a single DataFrame call.

Each module implements one operator family from SURVEY.md §2 (or a declared
upgrade) as a composition of DataFrame ops — no RDDs, no Python UDFs in the
hot path — so Catalyst keeps optimizing through them.
"""

from prajna_spark.operators.zipindex import zip_with_index

__all__ = ["zip_with_index"]
