"""First-class sinks.

The reference returns in-memory objects (SURVEY §2.2 'Sinks: None');
this engine's sinks are Spark writers plus the proto-bytes shape the
reference's ecosystem docs describe for Kafka (``docs/faq.md:20-25``):
a single ``binary`` column of serialized messages.

Scale notes: parquet writes inherit partitioning from the plan — call
``repartition(n)`` / ``partitionBy`` deliberately; the proto-bytes
encode is a zero-shuffle narrow map (``encode_proto_bytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion.distributed import encode_proto_bytes
from protarrow_spark.proto.model import MessageType


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink. ``partition_by`` creates hive-style directory
    partitions — pick low-cardinality keys (date, region), never a
    high-cardinality id (small-files explosion at 100 TB)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_proto_bytes(
    df: DataFrame,
    mtype: MessageType,
    path: str,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    mode: str = "overwrite",
    keep_cols: list[str] | None = None,
) -> None:
    """Serialize rows to proto wire bytes and write a parquet of
    ``(keep_cols..., proto binary)`` — the Kafka value shape, durable.
    Swap the parquet writer for ``.format("kafka")`` + a ``value``
    alias on a real cluster."""
    encoded = encode_proto_bytes(df, mtype, config, output_col="proto", keep_cols=keep_cols)
    encoded.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: co-locates rows by hash(bucket_col)
    at WRITE time so later equi-joins and aggregations on that key
    need NO shuffle — the pre-partitioning strategy for fact tables
    that join repeatedly on the same key at 100 TB (pay one shuffle
    once, at ingest, instead of per query).

    Optionally sort within buckets (turns joins into zero-sort merge
    joins). Bucketed output requires ``saveAsTable`` (bucket metadata
    lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
