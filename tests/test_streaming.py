"""Streaming slice: proto-bytes source -> decode -> watermark window
-> sink, asserted equivalent to the same transform run in batch
(micro-batch equivalence — the Structured Streaming contract)."""

from __future__ import annotations

import pyspark.sql.functions as F

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import decode_proto_bytes, messages_to_dataframe
from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import TIMESTAMP, Field, Kind, MessageType
from protarrow_spark.sources.sinks import write_parquet, write_proto_bytes
from protarrow_spark.streaming import (
    run_to_memory,
    stream_from_proto_parquet,
    windowed_counts,
)

CFG = ProtarrowSparkConfig()

CLICK = MessageType(
    "t.Click",
    (
        Field("user_id", 1, Kind.INT64),
        Field("kind", 2, Kind.STRING),
        Field("ts", 3, Kind.MESSAGE, message=TIMESTAMP),
    ),
)


def _clicks(n: int = 300) -> list[Message]:
    return [
        Message(
            CLICK,
            user_id=i % 5,
            kind=f"k{i % 2}",
            # spread across ~10 minutes, out of order
            ts=Message(TIMESTAMP, seconds=1_700_000_000 + ((i * 37) % 600)),
        )
        for i in range(n)
    ]


def test_stream_decode_window_equals_batch(spark, tmp_path) -> None:
    msgs = _clicks()
    src = messages_to_dataframe(spark, msgs, CLICK, CFG).repartition(4)
    path = str(tmp_path / "clicks_proto")
    write_proto_bytes(src, CLICK, path, CFG)

    # batch reference: same decode + same window transform
    batch = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    expected = sorted(
        windowed_counts(batch, "ts", "user_id").collect(),
        key=lambda r: (r["win_start"], r["user_id"]),
    )
    assert len(expected) > 5  # multiple windows actually formed

    # streaming: decode inside the stream, watermarked window agg
    sdf = stream_from_proto_parquet(spark, path, CLICK, CFG, max_files_per_trigger=2)
    assert sdf.isStreaming
    run_to_memory(windowed_counts(sdf, "ts", "user_id"), "clicks_windows")
    got = sorted(
        spark.sql("SELECT * FROM clicks_windows").collect(),
        key=lambda r: (r["win_start"], r["user_id"]),
    )
    assert got == expected


def test_write_proto_bytes_roundtrip_files(spark, tmp_path) -> None:
    msgs = _clicks(40)
    src = messages_to_dataframe(spark, msgs, CLICK, CFG)
    path = str(tmp_path / "proto_sink")
    write_proto_bytes(src, CLICK, path, CFG)
    back = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    assert back.count() == 40
    assert set(back.columns) == {"user_id", "kind", "ts"}
    # values survive the file hop
    assert back.agg(F.sum("user_id")).collect()[0][0] == sum(m.user_id for m in msgs)


def test_write_parquet_partitioned(spark, tmp_path) -> None:
    df = spark.range(100).withColumn("bucket", F.col("id") % 4)
    path = str(tmp_path / "p")
    write_parquet(df, path, partition_by=["bucket"])
    back = spark.read.parquet(path)
    assert back.count() == 100
    # partition pruning works against the directory layout
    plan = (
        back.filter(F.col("bucket") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_streaming_dedup_equals_batch(spark, tmp_path) -> None:
    """dropDuplicatesWithinWatermark collapses dups that arrive within
    the watermark — with all test dups inside it, streaming output
    equals batch dropDuplicates."""
    from protarrow_spark.streaming import streaming_dedup

    msgs = _clicks(200)
    dup = msgs + msgs[:50]  # replayed slice = duplicate (user_id, ts)
    src = messages_to_dataframe(spark, dup, CLICK, CFG).repartition(4)
    path = str(tmp_path / "dups_proto")
    write_proto_bytes(src, CLICK, path, CFG)

    batch = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    expected = sorted(
        streaming_dedup(batch, ["user_id", "ts"], "ts").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["kind"]),
    )
    assert len(expected) < batch.count()

    sdf = stream_from_proto_parquet(spark, path, CLICK, CFG)
    deduped = streaming_dedup(sdf, ["user_id", "ts"], "ts", watermark="30 minutes")
    run_to_memory(deduped, "dedup_out")
    got = sorted(
        spark.sql("SELECT * FROM dedup_out").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["kind"]),
    )
    assert got == expected


def test_stream_stream_join_equals_batch(spark, tmp_path) -> None:
    """Watermarked interval join of two proto streams matches the
    identical predicate run as a batch join."""
    from protarrow_spark.streaming import stream_stream_join

    clicks = _clicks(120)
    # 'views' slightly after clicks for the same users
    views = [
        Message(
            CLICK,
            user_id=m.user_id,
            kind="view",
            ts=Message(TIMESTAMP, seconds=m.ts.seconds + 10),
        )
        for m in clicks[::2]
    ]
    lpath = str(tmp_path / "l_proto")
    rpath = str(tmp_path / "r_proto")
    write_proto_bytes(messages_to_dataframe(spark, clicks, CLICK, CFG), CLICK, lpath, CFG)
    write_proto_bytes(messages_to_dataframe(spark, views, CLICK, CFG), CLICK, rpath, CFG)

    lb = decode_proto_bytes(spark.read.parquet(lpath), "proto", CLICK, CFG)
    rb = decode_proto_bytes(spark.read.parquet(rpath), "proto", CLICK, CFG)
    key = lambda r: (r["user_id"], r["l_ts"], r["r_ts"])
    expected = sorted(
        stream_stream_join(lb, rb, "user_id", "ts", "ts").collect(), key=key
    )
    assert len(expected) > 0

    ls = stream_from_proto_parquet(spark, lpath, CLICK, CFG)
    rs = stream_from_proto_parquet(spark, rpath, CLICK, CFG)
    joined = stream_stream_join(
        ls, rs, "user_id", "ts", "ts", watermark="30 minutes"
    )
    run_to_memory(joined, "join_out")
    got = sorted(spark.sql("SELECT * FROM join_out").collect(), key=key)
    assert got == expected


def test_sliding_window_equals_batch(spark, tmp_path) -> None:
    """Hopping windows (1 min window, 30 s slide): each event lands in
    2 windows; streaming output equals the batch expansion."""
    msgs = _clicks(150)
    src = messages_to_dataframe(spark, msgs, CLICK, CFG).repartition(4)
    path = str(tmp_path / "slide_proto")
    write_proto_bytes(src, CLICK, path, CFG)

    batch = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    expected = sorted(
        windowed_counts(batch, "ts", "user_id", slide="30 seconds").collect(),
        key=lambda r: (r["win_start"], r["user_id"]),
    )
    tumbling = windowed_counts(batch, "ts", "user_id").collect()
    assert sum(r["n_events"] for r in expected) == 2 * sum(r["n_events"] for r in tumbling)

    sdf = stream_from_proto_parquet(spark, path, CLICK, CFG)
    run_to_memory(windowed_counts(sdf, "ts", "user_id", slide="30 seconds"), "slide_out")
    got = sorted(
        spark.sql("SELECT * FROM slide_out").collect(),
        key=lambda r: (r["win_start"], r["user_id"]),
    )
    assert got == expected


def test_rate_source_wire_pipeline_batch_equivalence(spark) -> None:
    """Kafka stand-in: rate-micro-batch source -> executor-side wire
    SERIALIZE -> decode_proto_bytes, run as a live streaming job. The
    rate source's deterministic values (0,1,2,...) let a driver-built
    batch of the same messages pin every decoded row value-exactly."""
    import time

    from protarrow_spark.proto.message import Message
    from protarrow_spark.proto.model import Field, Kind, MessageType
    from protarrow_spark.streaming import stream_wire_from_rate

    tick = MessageType(
        "t.Tick",
        (
            Field("tick_id", 1, Kind.INT64),
            Field("bucket", 2, Kind.STRING),
            Field("amount", 3, Kind.SINT64),
        ),
    )

    def build(v: int) -> Message:
        return Message(tick, tick_id=v, bucket=f"b{v % 7}", amount=(v - 8) * 3)

    decoded = stream_wire_from_rate(spark, tick, build, rows_per_batch=40)
    q = (
        decoded.writeStream.format("memory")
        .queryName("rate_wire")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM rate_wire").collect()[0]["c"]
            if n >= 80:  # at least two micro-batches flowed
                break
            time.sleep(0.5)
        assert n >= 80, f"stream produced only {n} rows"
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT * FROM rate_wire WHERE value < 80 ORDER BY value"
    ).collect()
    assert [r["value"] for r in rows] == list(range(80))
    for r in rows:
        expect = build(r["value"])
        assert r["tick_id"] == expect.tick_id
        assert r["bucket"] == expect.bucket
        assert r["amount"] == expect.amount


def test_checkpoint_resume_processes_each_file_once(spark, tmp_path) -> None:
    """Exactly-once at the source: a query restarted from its
    CHECKPOINT processes only files that arrived after the previous
    run — the recovery contract a production pipeline (Kafka offsets,
    file listings) depends on. Three availableNow runs against one
    checkpoint: initial backlog, new-arrivals-only, and an idle rerun
    that must append NOTHING (no reprocessing, no duplicates)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def arrive(msgs, mode):
        df = messages_to_dataframe(spark, msgs, CLICK, CFG).repartition(2)
        write_proto_bytes(df, CLICK, src, CFG, mode=mode)

    def run_from_checkpoint():
        typed = stream_from_proto_parquet(spark, src, CLICK, CFG)
        q = (
            typed.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    arrive(_clicks(120), mode="overwrite")
    assert run_from_checkpoint().count() == 120

    arrive(_clicks(80), mode="append")  # new files alongside the old
    out = run_from_checkpoint()
    assert out.count() == 200  # 120 + 80: old files NOT reprocessed

    out = run_from_checkpoint()  # nothing new arrived
    assert out.count() == 200

    # content equivalence, not just counts: sink equals a batch decode
    batch = decode_proto_bytes(spark.read.parquet(src), "proto", CLICK, CFG)
    key = lambda r: (r["user_id"], r["kind"], r["ts"])
    assert sorted(out.collect(), key=key) == sorted(batch.collect(), key=key)
