"""Timezone-robust event-time helpers.

The driver's parquet stores naive wall-clock timestamps
(``timestamp[us]`` with no zone), which Spark 4 surfaces as
``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults to true).  ``unix_micros`` & friends only accept the
zoned ``TIMESTAMP`` type, so every epoch extraction in the engine
goes through :func:`epoch_micros`, which is NTZ-safe *and*
session-timezone-independent: a naive wall clock is interpreted as
UTC, exactly how the DuckDB oracle's ``epoch_us(ts)`` reads the same
parquet value.  (Reference analogue: protarrow's unit-exact temporal
converters, ``proto_to_arrow.py:106-139`` — one declared policy for
how a timestamp becomes an integer, applied everywhere.)
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

__all__ = ["epoch_micros"]

def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP or TIMESTAMP_NTZ
    column (LongType).

    For NTZ input the wall clock is taken as UTC (tz-independent, pure
    integer difference — stays in whole-stage codegen).  For zoned
    input the cast to NTZ uses the session timezone, which every
    registered query pins to UTC, making the two paths agree.
    """
    c = F.col(col) if isinstance(col, str) else col
    # Naive epoch literal built from a string cast: no session timezone
    # is consulted anywhere on this path. (Built per-call because a
    # Column literal needs an active session; Catalyst constant-folds it.)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, c.cast("timestamp_ntz"))
