"""Conversion micro-benchmark mirroring the reference's own harness
(/root/reference/benchmarks/test_benchmark.py:8-21): encode N random
full-coverage messages (EXAMPLE mirrors ExampleMessage's every-type
matrix, protos/bench.proto:24-173) to a DataFrame and decode them
back, N in {10, 100, 1_000, 10_000} — the reference publishes no
numbers (CI runs --benchmark-disable), so these are the recorded
measurements BASELINE.md points at.

Run: PYTHONPATH=. python benchmarks/bench_conversion.py
Prints one JSON line: {"encode_s": {N: sec}, "decode_s": {N: sec},
"encode_msgs_per_s": ..., "decode_msgs_per_s": ...} (best of 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZES = [10, 100, 1_000, 10_000]


def main() -> None:
    from random_messages import random_messages

    from protarrow_spark import (
        ProtarrowSparkConfig,
        dataframe_to_messages,
        get_spark,
        messages_to_dataframe,
    )
    from protarrow_spark.proto.fixtures import EXAMPLE

    spark = get_spark("bench-conversion", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    cfg = ProtarrowSparkConfig()

    encode_s: dict[int, float] = {}
    decode_s: dict[int, float] = {}
    for n in SIZES:
        msgs = random_messages(EXAMPLE, n, seed=7)
        # warm + correctness guard: one full round-trip first
        df = messages_to_dataframe(spark, msgs, EXAMPLE, cfg)
        assert df.count() == n
        best_e = best_d = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = messages_to_dataframe(spark, msgs, EXAMPLE, cfg)
            df.write.format("noop").mode("overwrite").save()
            best_e = min(best_e, time.perf_counter() - t0)
            t0 = time.perf_counter()
            back = dataframe_to_messages(df, EXAMPLE, cfg)
            assert len(back) == n
            best_d = min(best_d, time.perf_counter() - t0)
        encode_s[n] = round(best_e, 4)
        decode_s[n] = round(best_d, 4)

    top = SIZES[-1]
    print(
        json.dumps(
            {
                "metric": "conversion_roundtrip_micro",
                "encode_s": encode_s,
                "decode_s": decode_s,
                "encode_msgs_per_s": round(top / encode_s[top]),
                "decode_msgs_per_s": round(top / decode_s[top]),
                "message_type": "EXAMPLE (full type-coverage matrix)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
