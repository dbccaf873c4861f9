"""prajna_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MSRCCS/Prajna (see SURVEY.md).

Architecture: everything is declared through the DataFrame/SQL API so
Catalyst + Tungsten pick the physical strategy (predicate pushdown, column
pruning, broadcast/sort-merge join selection, whole-stage codegen, AQE).
The reference's typed-closure operator surface (DSet/DKV,
/root/reference/src/CoreLib/DSetGenerics.fs, DKV.fs) is re-expressed as a
thin facade over DataFrames in :mod:`prajna_spark.dset`; the query catalog
consumed by the driver lives in :mod:`prajna_spark.queries`.

Layout:
  session    — SparkSession factory tuned for local[N] testing / cluster scale
  sources    — table catalog over the driver's parquet testdata
  dset       — DSet/DKV operator facade (SURVEY §2) over DataFrame
  functions  — scalar/vector/text column-function library (built-ins only)
  operators  — distributed operators that need more than one DataFrame call
  plans      — plan-inspection helpers (pushdown / join-strategy assertions)
  pipeline   — LLM-data-pipeline ops: dedup, similarity, text analysis,
               multimodal column plumbing
  streaming  — Structured Streaming telemetry patterns (Prajna service loop)
  queries    — named query catalog + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
