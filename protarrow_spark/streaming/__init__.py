"""Structured Streaming surface: proto-bytes ingest -> decode ->
watermarked windows -> sink (the reference's Kafka micro-batch
pattern, ``docs/faq.md:20-25``, made real on Spark)."""

from protarrow_spark.streaming.pipeline import (
    stream_from_proto_parquet,
    stream_stream_join,
    stream_wire_from_rate,
    streaming_dedup,
    run_to_memory,
    windowed_counts,
)
from protarrow_spark.streaming.stateful import running_totals

__all__ = [
    "stream_from_proto_parquet",
    "stream_stream_join",
    "stream_wire_from_rate",
    "streaming_dedup",
    "run_to_memory",
    "running_totals",
    "windowed_counts",
]
