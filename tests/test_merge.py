"""CDC apply / MERGE semantics (operators/merge.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from protarrow_spark.operators.merge import apply_changes
from protarrow_spark.sources.tables import table


def test_apply_changes_semantics(spark, sf_dir) -> None:
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(1000).localCheckpoint()
    keys = [r[0] for r in base.select("o_orderkey").orderBy("o_orderkey").head(3)]
    upd_k, del_k, tpl_k = keys
    ins_k = 10**12 + 7
    ch = spark.createDataFrame(
        [
            (upd_k, "X", 1.5, "U"),
            (del_k, None, None, "D"),
            (ins_k, "N", 2.5, "I"),
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double, op string",
    )
    out = apply_changes(base, ch, "o_orderkey")
    rows = {r["o_orderkey"]: r for r in out.collect()}
    assert out.count() == base.count() - 1 + 1  # one delete, one insert
    assert rows[upd_k]["o_orderstatus"] == "X" and rows[upd_k]["o_totalprice"] == 1.5
    assert del_k not in rows
    assert rows[ins_k]["o_orderstatus"] == "N"
    # untouched rows keep base values
    b = base.filter(F.col("o_orderkey") == tpl_k).first()
    assert rows[tpl_k]["o_totalprice"] == b["o_totalprice"]


def test_apply_changes_never_shuffles_base(spark, sf_dir) -> None:
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ch = base.limit(10).withColumn("op", F.lit("U"))
    plan = (
        apply_changes(base, ch, "o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
