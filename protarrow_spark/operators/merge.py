"""MERGE INTO / CDC apply: upsert a change set onto a keyed base table.

Not in the reference (a conversion library, SURVEY.md §2.2); this is
the warehouse-maintenance operator (Delta/Iceberg MERGE, CDC apply)
expressed with plain DataFrame ops so it runs on bare parquet tables.

Scale shape — the whole point of this formulation: the base table is
NEVER shuffled. Updates and deletes reach it as a BROADCAST left join
on the primary key (a change batch is bounded — hours of CDC, not the
table), inserts are a union appended after. A full-outer-join
formulation would hash-partition 100 TB of base rows to apply a few
million changes; this one touches the base in the scan stage only.
With a bucketed base (sources/sinks.py write_bucketed) even the
output keeps the base's clustering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Change-operation codes in the ``op`` column of a change set.
OP_UPSERT = "U"
OP_DELETE = "D"
OP_INSERT = "I"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change set to ``base``; returns the merged table.

    ``changes`` carries the base's columns plus ``op_col`` in
    {'U','D','I'}: U rows replace the matching base row (by
    ``key_col``), D rows remove it, I rows are appended. An I whose
    key already exists behaves as U (last-writer-wins within one
    batch is the caller's contract — the change set must hold at most
    one row per key).

    The U/D subset broadcasts to a left join against the base (no
    base shuffle); the merged value picks change columns when a
    change matched, base columns otherwise; D matches drop the row.
    Inserts union on afterwards.
    """
    data_cols = [c for c in base.columns]
    ud = changes.filter(F.col(op_col).isin(OP_UPSERT, OP_DELETE)).select(
        F.col(key_col).alias("__m_key"),
        F.col(op_col).alias("__m_op"),
        *[F.col(c).alias(f"__m_{c}") for c in data_cols if c != key_col],
    )
    joined = base.join(
        F.broadcast(ud), base[key_col] == F.col("__m_key"), "left"
    )
    kept = joined.filter(
        F.col("__m_op").isNull() | (F.col("__m_op") == OP_UPSERT)
    )
    merged = kept.select(
        F.col(key_col),
        *[
            F.when(F.col("__m_op") == OP_UPSERT, F.col(f"__m_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in data_cols
            if c != key_col
        ],
    )
    inserts = changes.filter(F.col(op_col) == OP_INSERT).select(*data_cols)
    return merged.unionByName(inserts)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: apply a change batch to a
    versioned dimension, closing the current version of each changed
    key (its ``valid_to`` becomes the change timestamp) and appending
    the new version (``valid_from`` = change timestamp, open-ended).

    ``dim`` holds the full history; a row is CURRENT iff ``valid_to``
    is null. ``changes`` carries the dimension's data columns plus
    ``ts_col``; at most one change per key per batch.

    Same scale contract as :func:`apply_changes`: the dimension is
    never shuffled — the bounded change batch broadcasts to a left
    join that closes current rows in place, and the new versions are
    a union of the (small) change batch itself.
    """
    data_cols = [c for c in dim.columns if c not in (valid_from, valid_to)]
    ch = changes.select(
        F.col(key_col).alias("__s_key"),
        F.col(ts_col).alias("__s_ts"),
    )
    closed = dim.join(F.broadcast(ch), dim[key_col] == F.col("__s_key"), "left").select(
        *data_cols,
        F.col(valid_from),
        F.when(
            F.col(valid_to).isNull() & F.col("__s_ts").isNotNull(), F.col("__s_ts")
        )
        .otherwise(F.col(valid_to))
        .alias(valid_to),
    )
    new_versions = changes.select(
        *[F.col(c) for c in data_cols],
        F.col(ts_col).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return closed.unionByName(new_versions)
