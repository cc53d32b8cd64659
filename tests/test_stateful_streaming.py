"""Stateful streaming: session windows and custom
``applyInPandasWithState`` operators, asserted equivalent to batch
over the same inputs (micro-batch equivalence)."""

from __future__ import annotations

import pyspark.sql.functions as F

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import decode_proto_bytes, messages_to_dataframe
from protarrow_spark.operators.sessions import sessionize
from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import TIMESTAMP, Field, Kind, MessageType
from protarrow_spark.sources.sinks import write_proto_bytes
from protarrow_spark.streaming import running_totals, stream_from_proto_parquet

CFG = ProtarrowSparkConfig()

CLICK = MessageType(
    "t.SessClick",
    (
        Field("user_id", 1, Kind.INT64),
        Field("amount", 2, Kind.DOUBLE),
        Field("ts", 3, Kind.MESSAGE, message=TIMESTAMP),
    ),
)


def _bursty_clicks(n: int = 240) -> list[Message]:
    """Per-user bursts separated by > 5 min of silence so several
    sessions form per user."""
    out = []
    for i in range(n):
        user = i % 4
        burst = i // 60  # 4 bursts
        within = (i * 13) % 120  # up to 2 min inside the burst
        ts = 1_700_000_000 + burst * 1800 + within  # bursts 30 min apart
        out.append(
            Message(
                CLICK,
                user_id=user,
                amount=float(i % 7),
                ts=Message(TIMESTAMP, seconds=ts),
            )
        )
    return out


def _proto_dir(spark, tmp_path, msgs) -> str:
    src = messages_to_dataframe(spark, msgs, CLICK, CFG).repartition(4)
    path = str(tmp_path / "sess_proto")
    write_proto_bytes(src, CLICK, path, CFG)
    return path


def test_streaming_sessionize_equals_batch(spark, tmp_path) -> None:
    path = _proto_dir(spark, tmp_path, _bursty_clicks())

    batch = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    expected = sorted(
        sessionize(batch, "ts", "user_id", gap="5 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert len(expected) > 8  # several sessions per user actually formed

    sdf = stream_from_proto_parquet(spark, path, CLICK, CFG, max_files_per_trigger=2)
    sess = sessionize(sdf, "ts", "user_id", gap="5 minutes", watermark="10 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        spark.sql("SELECT * FROM sess_stream").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert got == expected


def test_running_totals_state_survives_micro_batches(spark, tmp_path) -> None:
    msgs = _bursty_clicks(120)
    path = _proto_dir(spark, tmp_path, msgs)

    # reference: plain batch aggregate == the final streaming state
    batch = decode_proto_bytes(spark.read.parquet(path), "proto", CLICK, CFG)
    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }

    # stream in several micro-batches so state must carry across them
    sdf = stream_from_proto_parquet(spark, path, CLICK, CFG, max_files_per_trigger=1)
    totals = running_totals(sdf, "user_id", "amount")
    q = (
        totals.writeStream.format("memory")
        .queryName("totals_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per touching micro-batch;
    # the row with the max n_events is the final state
    rows = spark.sql(
        """
        SELECT user_id, n_events, total FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM totals_stream) WHERE rn = 1
        """
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["total"]) for r in rows}
    assert got.keys() == expected.keys()
    for k, (n, s) in expected.items():
        gn, gs = got[k]
        assert gn == n, k
        assert abs(gs - s) < 1e-9, k
    # state actually crossed micro-batches: some key emitted more than once
    n_rows = spark.sql("SELECT COUNT(*) c FROM totals_stream").collect()[0]["c"]
    assert n_rows > len(expected)
