from protarrow_spark.sources.proto_files import (
    read_csv_typed,
    read_jsonl_typed,
    read_orc_typed,
    read_proto_binary,
    read_proto_jsonl,
)
from protarrow_spark.sources.tables import TABLE_NAMES, load_tables, table

__all__ = [
    "TABLE_NAMES",
    "load_tables",
    "table",
    "read_csv_typed",
    "read_jsonl_typed",
    "read_orc_typed",
    "read_proto_binary",
    "read_proto_jsonl",
]
