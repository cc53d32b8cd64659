"""Sessionization over event streams (batch + streaming).

Not in the reference (it has no query engine at all, SURVEY §2.2
"Streaming: Not implemented"); this is part of the engine layer the
brief requires. Expressed with the built-in ``F.session_window`` so:

* batch and streaming share one code path (the Structured Streaming
  contract — same transform, micro-batch equivalent);
* the state merge (overlapping [ts, ts+gap) ranges coalesce) runs
  JVM-side inside the streaming session-window state store, never in
  Python;
* the shuffle is exactly one exchange on the session key — identical
  to a plain groupBy at 100 TB, and AQE can coalesce partitions.

Semantics (pinned by the DuckDB oracle in queries/relational.py):
an event at ``ts`` extends the current session iff
``ts - prev_ts < gap``; a gap of exactly ``gap`` starts a new session
(Spark merges on *overlap* of half-open [ts, ts+gap) ranges).
``session end = last event ts + gap``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "1 hour",
    watermark: str | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Group events into per-key sessions separated by >= ``gap`` of
    inactivity; returns one row per (key, session) with start/end and
    the requested aggregates (default: event count).

    ``watermark`` bounds state for streaming inputs (ignored — by
    Spark semantics — on batch frames, which is what makes the
    batch/stream equivalence test meaningful).
    """
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg_exprs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(*[c.alias(n) for n, c in agg_exprs.items()])
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *agg_exprs.keys(),
        )
    )
