"""Data-layout operators: multi-dimensional clustering keys.

Not in the reference (a conversion library, SURVEY.md §2.2). At
100 TB the cheapest query is the one whose files you never open:
writing data ordered by a Z-order (Morton) key clusters rows that are
close in BOTH key dimensions into the same files, so min/max file
statistics prune scans with predicates on either dimension — the
standard multi-dimensional layout trick (public: Morton 1966; used by
Delta/Iceberg table layouts). Everything here is pure integer
expressions in whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Bits taken from each dimension (z-key width = 2 * ZORDER_BITS).
ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative int
    keys: bit k of x lands at position 2k, bit k of y at 2k+1.

    Built as a sum of shift/mask terms — identical integer arithmetic
    runs on any SQL engine (the oracle uses ``// % *``), and Catalyst
    constant-folds the per-bit weights.
    """
    terms = []
    for k in range(bits):
        terms.append(
            F.shiftright(x.cast("long"), k).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * k))
        )
        terms.append(
            F.shiftright(y.cast("long"), k).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * k + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(xcol: str, ycol: str, bits: int = ZORDER_BITS) -> str:
    """The identical interleave in portable SQL (DuckDB dialect)."""
    return " + ".join(
        f"(({xcol} // {1 << k}) % 2) * {1 << (2 * k)}"
        f" + (({ycol} // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(bits)
    )


def zorder_layout_stats(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = ZORDER_BITS,
    bucket_bits: int = 6,
) -> DataFrame:
    """Assign each row its Z-order file bucket (top ``bucket_bits`` of
    the z-key — what a layout-optimizing writer would range-partition
    on) and report per-bucket row counts and min/max of BOTH
    dimensions — the exact statistics a reader's file-skipping uses.
    Tight per-bucket rectangles are the whole point: a predicate on
    either dimension overlaps few buckets.

    Scale: one partial-aggregated groupBy on <= 2^bucket_bits keys;
    the z-key itself is scan-projection arithmetic. An actual rewrite
    is ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)
    .write...`` — same key, plus a range shuffle.
    """
    z = zorder_key(F.col(xcol), F.col(ycol), bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.select(
            bucket.alias("bucket"),
            F.col(xcol).alias("x"),
            F.col(ycol).alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


#: Compaction target: pack small files into ~this many bytes per
#: output file (tiny on the synthetic data; a real lake uses ~1 GiB).
COMPACTION_TARGET_BYTES = 512 * 1024


def compaction_bins(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int = COMPACTION_TARGET_BYTES,
) -> DataFrame:
    """Small-file compaction planning: within each table partition,
    assign files (ordered by file id for determinism) to contiguous
    compaction bins of ~``target_bytes`` — bin id = the file's
    starting byte offset in the partition's cumulative stream, integer-
    divided by the target. The standard maintenance pass every
    Delta/Iceberg-style lake runs (OPTIMIZE / rewrite_data_files);
    planning it as a query makes the rewrite a deterministic
    repartition spec instead of driver-side listing logic.

    Scale: ONE hash shuffle on the partition key + a window cumsum
    within each partition — file metadata rows (not data) are all that
    moves; the subsequent rewrite reads only bins with >= 2 files.

    Output: part_id, file, file_bytes, bin_id, bin_files (files in
    the file's bin — bins with 1 file are already compact and skipped
    by the rewrite).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("part_id").orderBy("file")
    sized = files.select(
        F.col(partition_col).alias("part_id"),
        F.col(file_col).alias("file"),
        F.col(bytes_col).alias("file_bytes"),
    ).withColumn(
        "start_offset",
        F.coalesce(
            F.sum("file_bytes").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    binned = sized.withColumn(
        "bin_id", F.expr(f"start_offset div {target_bytes}L").cast("long")
    )
    wb = Window.partitionBy("part_id", "bin_id")
    return binned.select(
        "part_id",
        "file",
        "file_bytes",
        "bin_id",
        F.count(F.lit(1)).over(wb).cast("long").alias("bin_files"),
    )
