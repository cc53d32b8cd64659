"""Temporal operators: as-of join.

Not in the reference (a conversion library, SURVEY.md §2.2) — the
classic time-series operator a proto-event pipeline needs first.

The implementation is the union-marker pattern, the scalable as-of
shape on Spark: tag both inputs, union them, and take the running
``last`` non-null right-side payload over a window ordered by
(time, marker, tiebreak) within each key. ONE shuffle (the window
partitioning), no range-join candidate explosion, no per-key state —
the same plan an interval join would need just for its candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    right_tiebreak: str,
    prefix: str = "r_",
) -> DataFrame:
    """Backward inclusive as-of join: for each left row, attach the
    right row with the greatest ``right_ts <= left_ts`` for the same
    key (ties on ``right_ts`` broken by the greatest
    ``right_tiebreak`` — a total order, so the result is
    deterministic under any partitioning).

    Output: every left column, plus each ``right_value_cols`` entry
    as ``{prefix}{name}`` (null when no right row precedes).

    Mechanics: right-side payloads ride in ONE struct so the window's
    ``last(..., ignorenulls=True)`` picks every value from the SAME
    matched row (per-column lasts could mix rows when a right value
    is legitimately null). Equal timestamps sort right-before-left
    via the marker, making the join inclusive.
    """
    rv_struct = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    rv_type = right.select(rv_struct.alias("rv")).schema["rv"].dataType

    left_payload = [c for c in left.columns if c != key_col]
    u_left = left.select(
        F.col(key_col),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_m"),
        F.lit(-1).cast(right.schema[right_tiebreak].dataType).alias("_tb"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    u_right = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_m"),
        F.col(right_tiebreak).alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        rv_struct.alias("_rv"),
    )
    u = u_left.unionByName(u_right)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_m", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_m") == 1
    )
    return matched.select(
        F.col(key_col),
        *[F.col(c) for c in left_payload],
        *[F.col("_match")[c].alias(f"{prefix}{c}") for c in right_value_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-salted inner equi-join: identical results to
    ``left.join(right, key_col)``, but a hot key's rows spread over
    ``n_salts`` shuffle partitions instead of one straggler task.

    Mechanics: each left row gets a deterministic salt from its
    non-key content hash; the right side replicates ``n_salts`` x and
    the join runs on (key, salt). Use when one side has a few
    dominant keys and AQE's skew-join split (which handles most
    cases) can't — e.g. a single key larger than any split threshold,
    or a deliberately pre-partitioned layout. Cost: right side is
    scanned/shuffled ``n_salts`` times — pick the SMALLER side to
    replicate.
    """
    non_key = [c for c in left.columns if c != key_col]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.xxhash64(F.col(key_col)),
        F.lit(n_salts),
    )
    lhs = left.withColumn("_salt", salt)
    rhs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return lhs.join(rhs, [key_col, "_salt"]).drop("_salt")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    right_tiebreak: str,
    prefix: str = "r_",
) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``):
    for each left row, attach the right row minimizing |right_ts -
    left_ts| within the key — ties between an equally-near earlier and
    later row resolve BACKWARD (the earlier row), and ties on the
    same timestamp resolve to the greatest ``right_tiebreak`` on the
    backward side / smallest on the forward side, so the result is a
    total function of the data.

    Mechanics: the union-marker pattern run in both directions over
    ONE key shuffle — a running ``last`` (backward-inclusive: right
    sorts before left at equal ts) and a mirrored ``first`` over the
    following frame (forward-inclusive: right sorts after left) give
    each left row its nearest earlier and later candidates; an
    integer-microsecond distance compare picks the winner. Two
    in-partition sorts share the single exchange; still no range
    explosion and no per-key state.

    Output: every left column, matched ``{prefix}{col}`` right values,
    ``matched_dir`` ('backward' | 'forward' | NULL), ``delta_us``.
    """
    rv_struct = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    rv_type = right.select(rv_struct.alias("rv")).schema["rv"].dataType
    tb_type = right.schema[right_tiebreak].dataType

    left_payload = [c for c in left.columns if c != key_col]
    u_left = left.select(
        F.col(key_col),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_m"),
        F.lit(-1).cast(tb_type).alias("_tb"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rt"),
    )
    u_right = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_m"),
        F.col(right_tiebreak).alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        rv_struct.alias("_rv"),
        F.col(right_ts).alias("_rt"),
    )
    u = u_left.unionByName(u_right)
    # Backward: right rows at equal ts sort BEFORE left (_m 0 < 1);
    # running last over preceding rows = nearest at-or-before match.
    wb = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_m", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: "first at-or-after in ascending order" == "running last
    # in DESCENDING order" — phrased as a preceding-frame running last
    # because Spark's unboundedFollowing frames re-scan the buffer per
    # row (O(n^2) per partition; measured 12x slower at sf1). Right
    # rows at equal ts must be visible to left rows, so in the
    # descending sort they come first: (1 - _m) descending.
    wf = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("_t"), F.desc(F.lit(1) - F.col("_m")), F.desc("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        u.withColumn("_back", F.last("_rv", ignorenulls=True).over(wb))
        .withColumn("_bt", F.last("_rt", ignorenulls=True).over(wb))
        .withColumn("_fwd", F.last("_rv", ignorenulls=True).over(wf))
        .withColumn("_ft", F.last("_rt", ignorenulls=True).over(wf))
        .filter(F.col("_m") == 1)
    )
    from protarrow_spark.functions.time import epoch_micros

    lt = epoch_micros(F.col("_t"))
    db = lt - epoch_micros(F.col("_bt"))
    df_ = epoch_micros(F.col("_ft")) - lt
    take_back = F.col("_bt").isNotNull() & (F.col("_ft").isNull() | (db <= df_))
    take_fwd = F.col("_ft").isNotNull() & (F.col("_bt").isNull() | (df_ < db))
    match = F.when(take_back, F.col("_back")).when(take_fwd, F.col("_fwd"))
    direction = F.when(take_back, F.lit("backward")).when(
        take_fwd, F.lit("forward")
    )
    delta = F.when(take_back, db).when(take_fwd, df_)
    return cand.select(
        F.col(key_col),
        *[F.col(c) for c in left_payload],
        *[match[c].alias(f"{prefix}{c}") for c in right_value_cols],
        direction.alias("matched_dir"),
        delta.cast("long").alias("delta_us"),
    )
