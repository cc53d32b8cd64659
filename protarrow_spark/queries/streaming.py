"""Structured Streaming queries in the correctness gate.

The reference documents streaming only as an ecosystem pattern
(``docs/faq.md:20-25``); here the streaming operators are first-class
oracle-gated queries: each runs a real Structured Streaming job
(``readStream`` file source -> watermarked windowed aggregation ->
``availableNow`` trigger -> memory sink) whose completed output is
deterministically equal to a batch aggregation — so the SAME DuckDB
value-oracle machinery that gates batch queries gates streaming.

Scale notes: the file source stands in for Kafka (swap
``readStream.format("kafka")`` + the proto decode path,
``streaming/pipeline.py``); the stateful window agg shuffles on the
window key exactly like batch, and the watermark bounds state. The
``availableNow`` trigger processes the backlog and terminates, which
is also the production backfill pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from protarrow_spark.queries.registry import query

#: Test hook: when set to an int N, every registered streaming query's
#: file source reads at most N files per micro-batch, forcing the
#: availableNow backlog to split across >=2 micro-batches when the
#: events table has >=2 files. The multi-micro-batch equivalence tests
#: (tests/test_streaming.py) set this to prove each query's completed
#: output is batching-invariant; production leaves it None (one
#: availableNow backlog batch, normal backfill behaviour).
FORCE_MAX_FILES_PER_TRIGGER: int | None = None


def _no_idle_batch(spark: SparkSession) -> None:
    """Disable no-data micro-batches for this session's streams (r14,
    guide §2 — fewer stateful rounds).

    After the availableNow backlog is processed, Spark by default runs
    one extra EMPTY micro-batch when the watermark advanced, purely to
    evict expired state — a full stateful-shuffle round (state-store
    open/commit on every partition) that produces nothing here. Every
    registered pattern's COMPLETED output is invariant to it: complete-
    mode aggregations re-emit the identical table, update-mode
    applyInPandasWithState uses NoTimeout (an empty batch invokes no
    groups), and the append-mode operators (inner stream-stream join,
    dropDuplicatesWithinWatermark) emit rows only in the batch the data
    arrives. Eviction exists for UNBOUNDED runs; an availableNow run
    terminates immediately after, so the cleanup batch is pure
    overhead at any scale (measured: stream_interval_join 2 -> 1
    micro-batches). Batching-invariance stays pinned by the forced
    multi-micro-batch tests (tests/test_streaming.py), which exercise
    watermark advancement across DATA batches.
    """
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet.

    A file stream needs an explicit schema; deriving it from the batch
    reader (a footer-only peek, no data scan) keeps the stream layout
    in lockstep with whatever the source actually stores — TIMESTAMP
    (NANOS) read as long nanos in older drops, plain µs TIMESTAMP_NTZ
    today — mirroring sources/tables.py. Watermarks require the zoned
    TIMESTAMP type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), so
    naive event time is cast under the UTC session every registered
    query pins — wall clock unchanged, matching the oracle's naive
    timestamps.
    """
    import os

    _no_idle_batch(spark)
    src = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src)
    reader = spark.readStream.schema(batch.schema)
    if FORCE_MAX_FILES_PER_TRIGGER is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(FORCE_MAX_FILES_PER_TRIGGER)
        )
    if os.path.isdir(src):
        # events as a multi-file directory (production layout / the
        # multi-micro-batch tests): stream the directory itself.
        raw = reader.parquet(src)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(
            sf_dir
        )
    ts_type = dict(batch.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


#: Last completed run's StreamingQueryProgress records per query name.
#: tools/plan_audit.py reads this after executing each streaming query
#: to audit the stateful-operator shape (operator names, state-row
#: counts, bounded-state evidence) that the batch EXPLAIN audit cannot
#: see — streaming plans are built by the streaming engine at run time.
STREAM_PROGRESS: dict[str, list[dict]] = {}


def _await_and_record(q, name: str) -> None:
    """awaitTermination + capture the run's progress JSON for the
    plan/state audit. Progress capture is best-effort diagnostics:
    it must never fail a query."""
    import json as _json

    q.awaitTermination()
    try:
        progs = []
        for p in q.recentProgress or []:
            if isinstance(p, dict):
                progs.append(p)
            else:
                progs.append(_json.loads(p.json if hasattr(p, "json") else str(p)))
        STREAM_PROGRESS[name] = progs
    except Exception:  # pragma: no cover - diagnostics only
        STREAM_PROGRESS[name] = []


def _run_to_memory(agg: DataFrame, name: str) -> DataFrame:
    """Run a streaming aggregation to completion into a memory sink and
    return the completed table. Complete output mode: every window is
    in the final table, so the result equals the batch aggregation
    (append mode would hold back windows newer than the watermark)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    # progress records key by REGISTRY name (memory-sink names carry a
    # mem_ prefix to avoid temp-view collisions)
    _await_and_record(q, name.removeprefix("mem_"))
    return agg.sparkSession.table(name)


@query(
    "stream_window_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-hour counts per event type, run as a REAL
    streaming job (readStream -> window agg -> availableNow -> memory
    sink); the completed stream equals the batch hourly rollup, which
    is what the oracle pins.

    Scale: one stateful shuffle on (window, type) — identical to the
    batch agg; the 2h watermark bounds state on an unbounded source.
    """
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, "mem_stream_window_counts")


@query(
    "stream_sliding_value",
    oracle="""
WITH b AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, event_type, value
  FROM events
),
w AS (
  SELECT b30 AS win_start, event_type, value FROM b
  UNION ALL
  SELECT b30 - INTERVAL '30 minutes' AS win_start, event_type, value FROM b
)
SELECT win_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM w
GROUP BY 1, 2
""",
)
def stream_sliding_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 1h/30m windowed totals per event type as a
    streaming job. Each event lands in exactly 2 overlapping windows —
    the oracle materializes the same assignment as a 2-way UNION of
    shifted 30-minute buckets.

    Scale: Spark expands the window assignment JVM-side (2 rows per
    event), then one stateful shuffle on (window, type); watermark
    bounds state.
    """
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, "mem_stream_sliding_value")


@query(
    "stream_session_windows",
    oracle="""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
""",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user as a streaming job
    — Structured Streaming's native ``session_window`` dynamic-merge
    state. A session's range is [start, last + gap): an event exactly
    gap after its predecessor starts a NEW session, which is why the
    lag-based oracle breaks on ``>= gap`` (not ``>``).

    Scale: state per in-flight session, merged as events arrive and
    evicted past the watermark; the shuffle keys on user_id only.
    """
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"), "user_id", "n_events"
        )
    )
    return _run_to_memory(agg, "mem_stream_session_windows")


@query(
    "stream_stateful_user_totals",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(27,6)) * 1000000 AS BIGINT))
            AS BIGINT) AS total_micros
FROM events
GROUP BY user_id
""",
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative totals via ``applyInPandasWithState`` run as
    a streaming job (update mode). The state machine itself is
    non-SQL-expressible in general, but its FINAL per-key state equals
    the batch group-by — which the oracle pins exactly: values are
    pre-scaled to exact integer micro-units (decimal(27,6) → long) so
    the Python-side accumulation is order-independent and hash-matches
    DuckDB bit-for-bit.

    The readout is micro-batch-invariant by construction: update mode
    emits one row per key per micro-batch the key appears in, so the
    sink holds the key's RUNNING totals at each emission, not just the
    final one. ``n_events`` is a strictly monotone per-key counter, so
    ``max(struct(n_events, total_micros))`` per key selects exactly the
    last emission — identical to the raw sink when the backlog lands in
    one micro-batch, and still correct under any file-listing /
    maxFilesPerTrigger split (pinned by the >=2-micro-batch forcing
    test in tests/test_streaming.py).

    Scale: state is one (n, sum) pair per key; the grouped shuffle is
    the same as a batch groupBy on user_id; the snapshot agg is one
    more shuffle over sink-sized (keys x batches) data.
    """
    from protarrow_spark.streaming.stateful import running_totals

    ev = _stream_events(spark, sf_dir).withColumn(
        "value_micros",
        (F.col("value").cast("decimal(27,6)") * 1000000).cast("long"),
    )
    totals = running_totals(ev, "user_id", "value_micros", integral=True)
    q = (
        totals.select(
            "user_id", "n_events", F.col("total").alias("total_micros")
        )
        .writeStream.format("memory")
        .queryName("mem_stream_stateful_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q, "stream_stateful_user_totals")
    sink = spark.table("mem_stream_stateful_user_totals")
    last = F.max(F.struct("n_events", "total_micros")).alias("s")
    return (
        sink.groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_micros").alias("total_micros"),
        )
    )


@query(
    "stream_static_enrich",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins the static
    customer dimension (user_id = c_custkey) and aggregates per
    market segment — the canonical 'enrich a stream with a dim table'
    production pattern, run as a real streaming job whose completed
    output equals the batch join the oracle pins.

    Scale: the dimension is loaded once per micro-batch planner epoch
    and broadcast; the stream side never shuffles for the join, and
    the stateful agg shuffles only (segment) keys. At 100 TB/day the
    same topology holds — the dim refresh cadence is the only knob.
    """
    import os

    dim = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    )
    ev = _stream_events(spark, sf_dir).select("user_id", "value")
    agg = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
    )
    return _run_to_memory(agg, "mem_stream_static_enrich")


@query(
    "stream_interval_join",
    oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us
FROM events c JOIN events p
  ON c.user_id = p.user_id AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL '4 hours'
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click -> purchase attribution
    within 4 hours, same user) run as a REAL streaming job: both sides
    are watermarked streams and the range predicate bounds each side's
    join state, so the physical plan is the canonical bounded-state
    StreamingSymmetricHashJoin. Inner-join matches are emitted in the
    micro-batch they occur, so the completed availableNow run equals
    the batch interval join the oracle pins.

    Scale: state per key bounded by watermark + 4h window on both
    sides; the shuffle keys on user_id only — identical topology at
    100 TB/day, with the watermark the only state-size knob.
    """
    from protarrow_spark.functions.time import epoch_micros
    from protarrow_spark.streaming.pipeline import stream_stream_join

    ev = _stream_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = stream_stream_join(
        clicks, purchases, "user_id", "ts", "ts", watermark="8 hours", max_delay="4 hours"
    ).select(
        F.col("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        epoch_micros("l_ts").alias("click_us"),
        epoch_micros("r_ts").alias("purchase_us"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("mem_stream_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q, "stream_interval_join")
    return spark.table("mem_stream_interval_join")


@query(
    "stream_dedup_keys",
    oracle="""
SELECT DISTINCT user_id, event_type,
       date_trunc('hour', ts) AS hour_start
FROM events
""",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: one row per (user, event type, hour)
    via ``dropDuplicatesWithinWatermark`` — per-key state is EVICTED
    once the watermark passes, the only dedup that survives an
    unbounded stream. Only the key columns are emitted, so the
    completed output is the deterministic distinct-key set the batch
    oracle pins (which surviving row represents a key is arrival-
    order-dependent; the key set itself is not).

    Scale: state is one entry per in-flight key bounded by the
    watermark horizon; the shuffle keys on the dedup key — identical
    topology at 100 TB/day ingest.
    """
    ev = _stream_events(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour_start"), "ts"
    )
    deduped = (
        keyed.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "hour_start"])
        .select("user_id", "event_type", "hour_start")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("mem_stream_dedup_keys")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q, "stream_dedup_keys")
    return spark.table("mem_stream_dedup_keys")


def _stream_hll_oracle() -> str:
    from protarrow_spark.operators.sketches import (
        HLL_M,
        HLL_NUMERATOR,
        HLL_TAIL_HEX,
        _NIBBLE_LZ,
    )

    shift = 4 * HLL_TAIL_HEX + 1
    nib_case = " ".join(f"WHEN '{d}' THEN {lz}" for d, lz in _NIBBLE_LZ.items())
    return f"""
WITH hashed AS (
  SELECT date_trunc('hour', ts) AS win_start,
         md5(CAST(user_id AS VARCHAR)) AS dg
  FROM events
),
rhos AS (
  SELECT win_start,
         CAST('0x' || substr(dg, 1, 2) AS BIGINT) AS register,
         CASE WHEN length(regexp_replace(substr(dg, 3, {HLL_TAIL_HEX}), '^0+', '')) = 0
              THEN {shift}
              ELSE ({HLL_TAIL_HEX} - length(regexp_replace(substr(dg, 3, {HLL_TAIL_HEX}), '^0+', ''))) * 4
                   + (CASE substr(regexp_replace(substr(dg, 3, {HLL_TAIL_HEX}), '^0+', ''), 1, 1)
                      {nib_case} ELSE 0 END)
                   + 1
         END AS rho
  FROM hashed
),
regs AS (
  SELECT win_start, register, MAX(rho) AS r FROM rhos GROUP BY win_start, register
),
per_group AS (
  SELECT win_start, COUNT(*) AS n_present,
         SUM(CAST(2.0 ** ({shift} - r) AS BIGINT)) AS present_sum
  FROM regs GROUP BY win_start
),
totals AS (
  SELECT win_start,
         CAST({HLL_M} - n_present AS BIGINT) AS n_zero_registers,
         CAST(present_sum + ({HLL_M} - n_present) * CAST(2.0 ** {shift} AS BIGINT) AS BIGINT) AS hll_sum
  FROM per_group
)
SELECT win_start, n_zero_registers, hll_sum,
       {HLL_NUMERATOR!r} / CAST(hll_sum AS DOUBLE) AS est_distinct
FROM totals
"""


@query("stream_hll_sketch", oracle=_stream_hll_oracle())
def stream_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog: per-hour distinct-user estimates where
    the STREAMING STATE IS THE SKETCH — the stateful aggregation keys
    on (hour window, register) and folds with MAX(rho), so in-flight
    state per window is <= 256 small integers no matter how many
    events arrive (a streaming COUNT(DISTINCT) would need unbounded
    per-window key sets). The finalize readout (exact-integer harmonic
    denominator, one double division) runs as a batch query over the
    completed register table; the oracle recomputes windows, registers,
    and estimates bit-for-bit.

    Scale: the shuffle keys on (window, register) — 256-way uniform
    within each window by construction; the watermark evicts window
    state; sketches from different streams/partitions merge by the
    same MAX, so the operator composes with cross-day rollups.
    """
    from protarrow_spark.operators.sketches import hll_finalize, hll_register_cols

    ev = _stream_events(spark, sf_dir)
    reg, rho = hll_register_cols("user_id")
    regs = (
        ev.withWatermark("ts", "2 hours")
        .select(F.window("ts", "1 hour").alias("win"), reg.alias("register"), rho.alias("rho"))
        .groupBy("win", "register")
        .agg(F.max("rho").alias("r"))
        .select(F.col("win.start").alias("win_start"), "register", "r")
    )
    state = _run_to_memory(regs, "mem_stream_hll_sketch")
    return hll_finalize(state, ["win_start"])


# ---------------------------------------------------------------------------
# stream_cms_topk — streaming count-min sketch, per-window heavy hitters
# ---------------------------------------------------------------------------

STREAM_CMS_TOPN = 5


def _stream_cms_oracle() -> str:
    from protarrow_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_bucket_sql,
    )

    depth, width, topn = CMS_DEPTH, CMS_WIDTH, STREAM_CMS_TOPN
    entries = "\nUNION ALL ".join(
        f"SELECT date_trunc('hour', ts) AS win_start, {j} AS j, "
        f"{_cms_bucket_sql('user_id', j, width)} AS bucket FROM events"
        for j in range(depth)
    )
    probe_cols = ", ".join(
        f"{_cms_bucket_sql('key', j, width)} AS b{j}" for j in range(depth)
    )
    joins = "\n".join(
        f"JOIN sketch s{j} ON s{j}.win_start = p.win_start AND s{j}.j = {j}"
        f" AND s{j}.bucket = p.b{j}"
        for j in range(depth)
    )
    least = ", ".join(f"s{j}.c" for j in range(depth))
    return f"""
WITH entries AS ({entries}),
sketch AS (SELECT win_start, j, bucket, COUNT(*) AS c FROM entries GROUP BY 1, 2, 3),
candidates AS (
  SELECT date_trunc('hour', ts) AS win_start, user_id AS key, COUNT(*) AS true_count
  FROM events GROUP BY 1, 2
),
probes AS (SELECT win_start, key, true_count, {probe_cols} FROM candidates),
est AS (
  SELECT p.win_start, p.key, LEAST({least}) AS est_count, p.true_count
  FROM probes p
  {joins}
),
ranked AS (
  SELECT win_start, key, est_count, true_count,
         ROW_NUMBER() OVER (PARTITION BY win_start
                            ORDER BY est_count DESC, key) AS rank
  FROM est
)
SELECT win_start, key, CAST(est_count AS BIGINT) AS est_count,
       CAST(true_count AS BIGINT) AS true_count, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {topn}
"""


@query("stream_cms_topk", oracle=_stream_cms_oracle())
def stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch: per-hour top-5 users by estimated
    event count, where (as with stream_hll_sketch) the STREAMING
    STATE IS THE SKETCH — the stateful aggregation keys on
    (window, hash row, bucket) and folds with SUM, so in-flight state
    per window is depth x width counters (4 x 256 small integers) no
    matter how many events arrive; a streaming exact top-k would hold
    every key. The heavy-hitter readout (min over the key's depth
    buckets, per-window rank) runs as a batch probe over the completed
    counter table, carrying the exact count alongside so the
    over-estimate is measurable — identical semantics to the batch
    sketch_cms_heavy_hitters (operators/sketches.py cms_heavy_hitters,
    same md5 bucket family), and the oracle recomputes windows,
    counters, and estimates bit-for-bit.

    Scale: the shuffle keys on (window, j, bucket) — 1024-way uniform
    within each window by construction; the watermark evicts window
    state; counters from different streams merge by the same SUM.
    """
    from pyspark.sql import Window

    from protarrow_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, _cms_bucket
    from protarrow_spark.sources.tables import table

    ev = _stream_events(spark, sf_dir)
    entries = (
        ev.withWatermark("ts", "2 hours")
        .select(
            F.window("ts", "1 hour").alias("win"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _cms_bucket(F.col("user_id"), j, CMS_WIDTH).alias("bucket"),
                        )
                        for j in range(CMS_DEPTH)
                    ]
                )
            ).alias("e"),
        )
        .groupBy("win", "e.j", "e.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("win.start").alias("win_start"), "j", "bucket", "c")
    )
    # Materialize the completed counter table once — the readout
    # probes it depth times (cms_heavy_hitters pattern).
    sketch = _run_to_memory(entries, "mem_stream_cms_topk").localCheckpoint(eager=True)

    cand = (
        table(spark, sf_dir, "events")
        .select(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("win_start"),
            F.col("user_id").alias("key"),
        )
        .groupBy("win_start", "key")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    probes = cand.select(
        "win_start",
        "key",
        "true_count",
        *[_cms_bucket(F.col("key"), j, CMS_WIDTH).alias(f"b{j}") for j in range(CMS_DEPTH)],
    )
    # Readout via ONE per-window counter map instead of CMS_DEPTH
    # broadcast joins (r14 — the same device the batch CMS readout
    # adopted in r13, windowed): the completed counter table collapses
    # to one map row per window keyed j*width+bucket, broadcast once,
    # and each probe reads its depth cells with map lookups. A probed
    # key's own events are in every one of its buckets, so every
    # lookup hits (the old inner joins matched for the same reason);
    # 4 BroadcastHashJoin + 4 broadcast builds -> 1 of each.
    sk = sketch.groupBy("win_start").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("j") * CMS_WIDTH + F.col("bucket")).alias("k"),
                    F.col("c").alias("v"),
                )
            )
        ).alias("cms")
    )
    est = probes.join(F.broadcast(sk), "win_start")
    est_count = F.least(
        *[F.col("cms")[F.lit(j) * CMS_WIDTH + F.col(f"b{j}")] for j in range(CMS_DEPTH)]
    )
    ranked = est.select(
        "win_start", "key", est_count.alias("est_count"), "true_count"
    )
    w = Window.partitionBy("win_start").orderBy(F.desc("est_count"), F.asc("key"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= STREAM_CMS_TOPN)
        .select(
            "win_start",
            "key",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("true_count").cast("long").alias("true_count"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# stream_drift_l1 — per-window distribution-drift monitoring
# ---------------------------------------------------------------------------


@query(
    "stream_drift_l1",
    oracle="""
WITH w AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
g AS (SELECT event_type, COUNT(*) AS gc FROM events GROUP BY 1),
tw AS (SELECT win_start, SUM(c) AS t_w FROM w GROUP BY 1),
tg AS (SELECT SUM(gc) AS t_g FROM g),
terms AS (
  SELECT w.win_start, ABS(w.c * tg.t_g - g.gc * tw.t_w) AS term
  FROM w
  JOIN g USING (event_type)
  JOIN tw USING (win_start)
  CROSS JOIN tg
)
SELECT t.win_start,
       CAST(tw.t_w AS BIGINT) AS t_w,
       CAST(SUM(t.term) AS BIGINT) AS l1_num,
       CAST(SUM(t.term) AS DOUBLE) / (tw.t_w * tg.t_g) AS l1
FROM terms t JOIN tw USING (win_start) CROSS JOIN tg
GROUP BY t.win_start, tw.t_w, tg.t_g
""",
)
def stream_drift_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor: each hour window's
    event-type mix is compared against the corpus baseline by L1
    distance — the alerting primitive of a production data-quality
    monitor (schema stays valid while the MIX silently shifts: bot
    floods, a source going dark, an upstream filter change).

    The streaming state is the per-window type histogram (one SUM per
    (window, type) — bounded by the type cardinality, watermark-
    evicted). The drift readout is exact INTEGER arithmetic: with
    window counts c_t (total T_w) and baseline counts g_t (total
    T_g), L1 = sum_t |c_t*T_g - g_t*T_w| / (T_w*T_g) — the numerator
    and both totals are order-invariant integers (one final IEEE
    division), so the gate is hash-exact.

    Scale: the stream shuffles on (window, type) with map-side
    partials; the baseline is a type-cardinality dimension + 1-row
    total, both broadcast; nothing window-unbounded is held.
    """
    from protarrow_spark.sources.tables import table

    ev = _stream_events(spark, sf_dir)
    w = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("win.start").alias("win_start"), "event_type", "c")
    )
    state = _run_to_memory(w, "mem_stream_drift_l1").localCheckpoint(eager=True)

    g = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("gc"))
        .localCheckpoint(eager=True)
    )
    tg = g.agg(F.sum("gc").alias("t_g"))
    tw = state.groupBy("win_start").agg(F.sum("c").alias("t_w"))
    return (
        state.join(F.broadcast(g), "event_type")
        .join(tw, "win_start")
        .crossJoin(F.broadcast(tg))
        .select(
            "win_start",
            "t_w",
            "t_g",
            F.abs(F.col("c") * F.col("t_g") - F.col("gc") * F.col("t_w")).alias("term"),
        )
        .groupBy("win_start", "t_w", "t_g")
        .agg(F.sum("term").alias("l1_num"))
        .select(
            "win_start",
            F.col("t_w").cast("long").alias("t_w"),
            F.col("l1_num").cast("long").alias("l1_num"),
            (F.col("l1_num").cast("double") / (F.col("t_w") * F.col("t_g"))).alias("l1"),
        )
    )


# ---------------------------------------------------------------------------
# stream_freshness_lag — streaming staleness monitor per partition
# ---------------------------------------------------------------------------


@query(
    "stream_freshness_lag",
    oracle=f"""
WITH hw AS (SELECT MAX(epoch_us(ts)) AS hwm FROM events),
per AS (
  SELECT event_type, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(hwm - last_us AS BIGINT) AS lag_us,
       CAST(CASE WHEN hwm - last_us > 3600000000 THEN 1 ELSE 0 END AS BIGINT)
         AS breaches_sla
FROM per CROSS JOIN hw
""",
)
def stream_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming staleness monitor (the streaming form of
    dq_freshness_lag): the state is ONE (max-epoch, count) pair per
    event type — constant-size, merge-by-max, so the completed stream
    equals the batch maxima under ANY micro-batching (max and count
    are order-free). The readout compares each partition's high-water
    mark against the global one and flags the 1-hour SLA, which is
    what an always-on ingestion monitor alerts from.

    Scale: per-type maxima aggregate map-side to one row per type per
    micro-batch; the global mark is a type-cardinality rollup of the
    sink, never a second pass over the stream."""
    from protarrow_spark.functions.time import epoch_micros

    ev = _stream_events(spark, sf_dir)
    per = ev.groupBy("event_type").agg(
        F.max(epoch_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    state = _run_to_memory(per, "mem_stream_freshness_lag").localCheckpoint(
        eager=True
    )
    hw = state.agg(F.max("last_us").alias("hwm"))
    return state.crossJoin(F.broadcast(hw)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("hwm") - F.col("last_us")).cast("long").alias("lag_us"),
        F.when(F.col("hwm") - F.col("last_us") > 3_600_000_000, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("breaches_sla"),
    )


# ---------------------------------------------------------------------------
# stream_multimodal_ingest — streaming decode of image blobs (codec x stream)
# ---------------------------------------------------------------------------


def _stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over documents.parquet (schema from a batch
    footer peek, same pattern as :func:`_stream_events`)."""
    import os

    _no_idle_batch(spark)
    src = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(src)
    reader = spark.readStream.schema(batch.schema)
    if FORCE_MAX_FILES_PER_TRIGGER is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(FORCE_MAX_FILES_PER_TRIGGER)
        )
    if os.path.isdir(src):
        return reader.parquet(src)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


@query(
    "stream_multimodal_ingest",
    oracle="""
WITH t AS (
  SELECT doc_id, hex(encode(text)) AS ph, len(hex(encode(text))) // 2 AS nb
  FROM documents
)
SELECT doc_id % 2 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_images,
       CAST(SUM(CASE WHEN doc_id % 2 = 0
                     THEN 16 * GREATEST(1, CAST(ceil(nb / 16.0) AS INT))
                     ELSE 0 END) AS BIGINT) AS total_pixels,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN coalesce(list_sum(
         [(instr('0123456789ABCDEF', substr(ph, 2*i-1, 1))-1)*16
            + (instr('0123456789ABCDEF', substr(ph, 2*i, 1))-1)
          FOR i IN range(1, nb + 1)]), 0) ELSE 0 END) AS BIGINT)
         AS total_pixel_sum
FROM t
GROUP BY 1
""",
)
def stream_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming multimodal ingest: a file-source document stream is
    blob-ified (even ids -> GENUINE 24-bit BMPs via the real encoder),
    decoded through the same Arrow-batched ``mapInPandas`` feature
    extractor the batch queries use — stateless Python transforms
    compose with Structured Streaming unchanged — and rolled up into
    per-bucket image counts and exact pixel sums (complete-mode
    aggregate, memory sink). This is the shape a 100 TB image-corpus
    ingest actually runs: stream in, decode partition-locally, emit
    bounded running stats; the oracle recomputes every decoded pixel
    from the source text.

    Scale: the decode stage holds NO streaming state (stateless
    mapInPandas); only the 2-row rollup is stateful. Swap the file
    source for Kafka and the BMP fixture for real blob fetch — the
    plan shape is identical."""
    import numpy as np
    import pandas as pd

    from protarrow_spark.operators import multimodal

    docs = _stream_documents(spark, sf_dir).select("doc_id", "text")

    def build(batches):
        for b in batches:
            blobs = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                data = str(text).encode("utf-8")
                if doc_id % 2 == 0:
                    h = max(1, -(-len(data) // 16))
                    px = np.zeros(h * 16, dtype=np.uint8)
                    px[: len(data)] = np.frombuffer(data, np.uint8)
                    blobs.append(multimodal.encode_bmp_gray(px.reshape(h, 16)))
                else:
                    blobs.append(data)
            yield pd.DataFrame({"doc_id": b["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(build, "doc_id long, blob binary")
    feats = multimodal.decode_image_features(blobs, "doc_id", "blob")
    agg = feats.groupBy((F.col("doc_id") % 2).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("width").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_images"),
        F.sum(F.coalesce(F.col("n_pixels"), F.lit(0)))
        .cast("long")
        .alias("total_pixels"),
        F.sum(F.coalesce(F.col("pixel_sum"), F.lit(0)))
        .cast("long")
        .alias("total_pixel_sum"),
    )
    return _run_to_memory(agg, "mem_stream_multimodal_ingest")


@query(
    "stream_proto_decode_tolerance",
    oracle="""
SELECT CASE WHEN (event_id % 7 = 0 OR event_id % 11 = 0)
            THEN NULL ELSE event_type END AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN (event_id % 7 = 0 OR event_id % 11 = 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN (event_id % 7 = 0 OR event_id % 11 = 0) THEN NULL
                     ELSE CAST(value AS DECIMAL(27,6)) END) AS DOUBLE)
         AS total_value
FROM events
GROUP BY 1
""",
)
def stream_proto_decode_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING permissive proto ingest — the Kafka shape this engine
    exists for: a stream of wire bytes where some records are corrupt
    (every 7th: unterminated-varint smash; every 11th: truncated
    length-delimited field, the bounds-check path), decoded with
    ``decode_proto_bytes(on_error="null")`` into typed columns inside
    the stream, dead letters counted in the same complete-mode rollup
    as the survivors' exact value sums. One bad record cannot kill the
    ingest, and the dead-letter rate is a first-class metric of the
    running job.

    The codec hops are stateless ``mapInPandas`` (the batch twin
    ``conv_decode_corrupt_tolerance`` pins the identical byte-level
    semantics); only the small per-type rollup is stateful. Swap the
    file source for ``readStream.format("kafka")`` and drop the
    fixture's encode half — the decode plan is byte-identical."""
    from protarrow_spark.config import ProtarrowSparkConfig
    from protarrow_spark.conversion.distributed import (
        decode_proto_bytes,
        encode_proto_bytes,
    )
    from protarrow_spark.queries.conversion import EVENT_MT

    ev = _stream_events(spark, sf_dir).select(
        F.col("event_id").alias("src_id"),
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
    )
    wire = encode_proto_bytes(
        ev, EVENT_MT, ProtarrowSparkConfig(), keep_cols=["src_id"]
    )
    corrupted = wire.withColumn(
        "proto",
        F.when(F.col("src_id") % 7 == 0, F.lit(b"\xff" * 11))
        .when(
            F.col("src_id") % 11 == 0,
            F.concat(F.col("proto"), F.lit(b"\x32\x7f")),
        )
        .otherwise(F.col("proto")),
    )
    typed = decode_proto_bytes(
        corrupted,
        "proto",
        EVENT_MT,
        ProtarrowSparkConfig(),
        keep_cols=["src_id"],
        on_error="null",
    )
    agg = typed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("event_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return _run_to_memory(agg, "mem_stream_proto_decode_tolerance")


def _stream_bottomk_oracle() -> str:
    from protarrow_spark.operators import sketches

    est = sketches.bottomk_quantiles_oracle_sql(
        "(SELECT * FROM events WHERE value IS NOT NULL)",
        "event_type", "value", "event_id",
    )
    return f"""
WITH cnt AS (
  SELECT event_type, COUNT(*) AS n_seen
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
est AS ({est})
SELECT c.event_type, CAST(c.n_seen AS BIGINT) AS n_seen,
       e.est_q50, e.est_q90
FROM cnt c JOIN est e ON e.event_type = c.event_type
"""


@query("stream_quantile_bottomk", oracle=_stream_bottomk_oracle())
def stream_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING bottom-k sample-quantile sketch: the mergeable sketch
    from ``operators.sketches.bottomk_quantiles`` maintained as
    ``applyInPandasWithState`` streaming state — the state per key is
    the k=256 rows with smallest md5(id) seen so far (bottom-k of a
    union merges, so any micro-batch split converges to the identical
    sample), and every micro-batch emits the key's current q50/q90
    estimates with a monotone n_seen counter. The completed output
    equals the BATCH sketch bit-for-bit, which is exactly what the
    oracle pins — running quantile monitoring over an unbounded stream
    with constant per-key state.

    Scale: k (hash, id, value) triples per key of state; one grouped
    shuffle, same as a batch groupBy."""
    from protarrow_spark.streaming.stateful import bottomk_quantile_state

    ev = _stream_events(spark, sf_dir).where(F.col("value").isNotNull())
    est = bottomk_quantile_state(
        ev.select("event_type", "value", "event_id"),
        "event_type", "value", "event_id",
    )
    q = (
        est.writeStream.format("memory")
        .queryName("mem_stream_quantile_bottomk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q, "stream_quantile_bottomk")
    sink = spark.table("mem_stream_quantile_bottomk")
    last = F.max(F.struct("n_seen", "est_q50", "est_q90")).alias("s")
    return (
        sink.groupBy("event_type")
        .agg(last)
        .select(
            "event_type",
            F.col("s.n_seen").alias("n_seen"),
            F.col("s.est_q50").alias("est_q50"),
            F.col("s.est_q90").alias("est_q90"),
        )
    )


def _py_text_ngrams(text: str | None, n: int) -> set:
    """Python replica of ``functions.text.text_ngrams`` for the
    streaming scorer's broadcast-set intersection: the SAME lookahead
    regex (n tokens separated by exactly one literal space, anchored
    at start-or-whitespace), the SAME whole-text fallback keyed on
    zero regex matches, and NULL passes through as the empty set (a
    NULL gram never equi-joins batch-side). ``re.ASCII`` pins
    ``\\s``/``\\S`` to the ASCII class so Python's Unicode-aware
    default cannot diverge from Java regex / DuckDB RE2 (both
    ASCII-``\\s`` by default) on exotic whitespace."""
    import re

    if text is None:
        return set()
    pat = _PY_NGRAM_PATS.get(n)
    if pat is None:
        pat = re.compile(
            r"(?:^|(?<=\s))(?=(" + " ".join([r"\S+"] * n) + r"))", re.ASCII
        )
        _PY_NGRAM_PATS[n] = pat
    grams = set(pat.findall(text))
    return grams if grams else {text}


_PY_NGRAM_PATS: dict[int, object] = {}


def _stream_decon_oracle() -> str:
    from protarrow_spark.queries.pipeline import (
        DECON_EVAL_MOD,
        DECON_N,
        _grams_cte,
        _toks_cte,
    )

    return f"""
WITH {_toks_cte()},
{_grams_cte(DECON_N)},
eval_g AS (SELECT DISTINCT g FROM dg WHERE doc_id % {DECON_EVAL_MOD} = 0),
hits AS (
  SELECT d.doc_id, COUNT(*) AS n
  FROM dg d JOIN eval_g USING (g)
  WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
  GROUP BY d.doc_id
)
SELECT doc.source,
       CAST(COUNT(*) AS BIGINT) AS n_train_docs,
       CAST(SUM(CASE WHEN h.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated_docs,
       CAST(COALESCE(SUM(h.n), 0) AS BIGINT) AS n_contaminated_grams
FROM documents doc LEFT JOIN hits h USING (doc_id)
WHERE doc.doc_id % {DECON_EVAL_MOD} <> 0
GROUP BY doc.source
"""


@query("stream_decontaminate", oracle=_stream_decon_oracle())
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING benchmark-decontamination gate — the always-on ingest
    form of ``text_decontaminate``: training documents arrive as a
    stream, each is scored against the (static, benchmark-sized)
    eval-set shingle vocabulary AT INGEST, and a per-source monitor
    rolls up how much contamination is flowing in. The shape an
    ingest pipeline actually runs in front of a training corpus: new
    crawl lands on Kafka, every doc is stamped contaminated/clean
    before it is admitted, and the per-source totals feed the intake
    dashboard.

    Topology (reuses text_decontaminate's broadcast argument): the
    eval shingle set is MBs against a 100 TB stream, so it is
    computed ONCE batch-side (same doc_shingles operator, residue
    class 0 mod 20) and shipped to executors as a SparkContext
    broadcast read inside a STATELESS Arrow-batched mapInPandas —
    per-doc shingling + set intersection never touches streaming
    state or the shuffle. The only stateful operator is the final
    per-source rollup (state = |sources| rows, volume-independent).
    Word n-grams replicate functions.text.text_ngrams exactly
    (token-anchored overlapping windows, whole-text fallback for
    short docs, per-doc distinct), so the completed output is
    hash-equal to the batch oracle.
    """
    import pandas as pd

    from protarrow_spark.operators import dedup
    from protarrow_spark.queries.pipeline import DECON_EVAL_MOD, DECON_N
    from protarrow_spark.sources.tables import table

    docs_batch = table(spark, sf_dir, "documents")
    eval_g = (
        dedup.doc_shingles(docs_batch, "doc_id", "text", DECON_N)
        .filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select("g")
        .distinct()
        .collect()
    )
    # A NULL gram can never equi-join batch-side, so drop it from the
    # broadcast set rather than letting Python None-equality diverge.
    bc = spark.sparkContext.broadcast(
        frozenset(r["g"] for r in eval_g if r["g"] is not None)
    )
    n = DECON_N

    def score(batches):
        ev = bc.value
        for b in batches:
            counts = [len(_py_text_ngrams(text, n) & ev) for text in b["text"]]
            yield pd.DataFrame(
                {"source": b["source"], "n_contaminated": counts}
            )

    train = _stream_documents(spark, sf_dir).filter(
        F.col("doc_id") % DECON_EVAL_MOD != 0
    )
    scored = train.select("source", "text").mapInPandas(
        score, "source string, n_contaminated long"
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_train_docs"),
        F.sum((F.col("n_contaminated") > 0).cast("long"))
        .cast("long")
        .alias("n_contaminated_docs"),
        F.sum("n_contaminated").cast("long").alias("n_contaminated_grams"),
    )
    return _run_to_memory(agg, "mem_stream_decontaminate")


@query(
    "stream_cdc_latest",
    oracle="""
WITH r AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_micros,
         event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE user_id IS NOT NULL
)
SELECT user_id, ts_micros, event_id, event_type, value
FROM r WHERE rn = 1
""",
)
def stream_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING latest-per-key materialization (r13 birth) — the CDC
    compaction / SCD-type-1 table-maintenance shape: a keyed change
    stream (Debezium topic, activity log) reduced to the single most
    recent row per key, maintained incrementally in streaming state
    instead of recomputed by a batch window. The per-key argmax on
    (event time, event id) is what a Kafka log-compacted topic or a
    MERGE-on-read table does continuously; here it is
    ``applyInPandasWithState`` with ONE tuple of state per key.

    Determinism: (ts_micros, event_id) is a total order, so argmax
    over any micro-batch split converges to the batch answer — the
    completed output hash-matches the ROW_NUMBER oracle, and the
    update-mode sink readout selects each key's final emission by the
    same monotone (ts_micros, event_id) maximum.

    Scale: state = |keys| tuples (key-proportional, volume-
    independent — the state-row audit's bounded-state criterion); the
    only shuffle is the per-key grouping, identical to a batch
    groupBy. The ``value`` column rides through untouched, so no
    float arithmetic anywhere.
    """
    from protarrow_spark.functions.time import epoch_micros
    from protarrow_spark.streaming.stateful import latest_event_per_key

    ev = (
        _stream_events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            epoch_micros(F.col("ts")).alias("ts_micros"),
            "event_id",
            "event_type",
            "value",
        )
    )
    latest = latest_event_per_key(ev)
    q = (
        latest.writeStream.format("memory")
        .queryName("mem_stream_cdc_latest")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q, "stream_cdc_latest")
    sink = spark.table("mem_stream_cdc_latest")
    last = F.max(
        F.struct("ts_micros", "event_id", "event_type", "value")
    ).alias("s")
    return (
        sink.groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("s.ts_micros").alias("ts_micros"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.event_type").alias("event_type"),
            F.col("s.value").alias("value"),
        )
    )
