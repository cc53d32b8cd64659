"""Streaming decode + windowed aggregation.

The pipeline the reference documents as an ecosystem pattern
(``docs/faq.md:20-25``: consume proto from Kafka in micro-batches,
convert, aggregate) expressed natively in Structured Streaming:

    readStream (binary proto column)
      -> decode_proto_bytes            (same code path as batch!)
      -> withWatermark + window agg    (late data bounded)
      -> sink

``decode_proto_bytes`` is a narrow ``mapInPandas`` so it is streaming-
compatible unchanged — batch/stream parity of the conversion layer is
tested by running the same transform both ways and diffing
(``tests/test_streaming.py``).

The local source is a parquet directory of proto-bytes rows (written
by ``sinks.write_proto_bytes``); on a real cluster swap in
``readStream.format("kafka")`` and decode ``value``. Scale notes:
decode adds no shuffle; the stateful window agg shuffles on the
window key exactly like batch; the watermark bounds state size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion.distributed import decode_proto_bytes
from protarrow_spark.proto.model import MessageType


def stream_from_proto_parquet(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    bytes_col: str = "proto",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of decoded messages from a proto-bytes
    parquet directory (Kafka-value shape, durable local stand-in)."""
    reader = spark.readStream.schema(f"{bytes_col} binary")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    return decode_proto_bytes(raw, bytes_col, mtype, config)


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts + sum per key with a watermark bound on
    late data. Works identically on batch and streaming frames
    (batch ignores the watermark — Spark semantics), which is exactly
    what the equivalence test exploits."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col(key_col),
            F.col("n_events"),
        )
    )


def run_to_memory(sdf: DataFrame, name: str) -> None:
    """Drain an availableNow micro-batch run into an in-memory table
    (test/dev sink; production uses kafka/parquet sinks)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
