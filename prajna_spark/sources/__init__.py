from prajna_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    stream_table,
)
from prajna_spark.sources.imports import (
    export_seq_function,
    import_source,
    import_source_n,
    telemetry_cycle,
    unregister_seq_function,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "stream_table",
    "export_seq_function",
    "import_source",
    "import_source_n",
    "telemetry_cycle",
    "unregister_seq_function",
]
