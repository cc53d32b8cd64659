"""Structured Streaming surface: proto-bytes ingest -> decode ->
watermarked windows -> sink (the reference's Kafka micro-batch
pattern, ``docs/faq.md:20-25``, made real on Spark)."""

from protarrow_spark.streaming.pipeline import (
    stream_from_proto_parquet,
    run_to_memory,
    windowed_counts,
)

__all__ = ["stream_from_proto_parquet", "run_to_memory", "windowed_counts"]
