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


def test_streaming_cdc_apply_equals_batch(spark, sf_dir, tmp_path) -> None:
    """CDC-over-streaming: change batches arrive as a stream; each
    micro-batch MERGEs into the stored table via foreachBatch +
    apply_changes (the Delta/Iceberg streaming-upsert pattern on bare
    parquet). Final table state must equal applying the batches
    sequentially in batch mode — exactly-once apply per batch."""
    import pyspark.sql.functions as F

    from protarrow_spark.operators.merge import apply_changes

    base = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
        .localCheckpoint()
    )
    store = str(tmp_path / "store")
    base.coalesce(1).write.mode("overwrite").parquet(store)

    # two deterministic change batches, keyed by batch_id file
    keys = [r[0] for r in base.select("o_orderkey").orderBy("o_orderkey").head(4)]
    batches = [
        [(keys[0], "A", 10.0, "U"), (keys[1], None, None, "D")],
        [(keys[2], "B", 20.0, "U"), (10**12 + 1, "N", 30.0, "I")],
    ]
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double, op string"
    chdir = tmp_path / "changes"
    chdir.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("overwrite").parquet(
            str(chdir / f"b{i}")
        )

    # batch reference: sequential application
    ref = base
    for i in range(len(batches)):
        ref = apply_changes(ref, spark.read.parquet(str(chdir / f"b{i}")), "o_orderkey")
    ref_rows = sorted((r[0], r[1], r[2]) for r in ref.collect())

    # streaming: one file per trigger, foreachBatch merges into store
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chdir / "b*"))
    )

    def merge_batch(bdf, batch_id):
        cur = bdf.sparkSession.read.parquet(store)
        merged = apply_changes(cur, bdf, "o_orderkey")
        # two-phase write: parquet cannot overwrite its own input
        tmp = store + f".tmp{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        bdf.sparkSession.read.parquet(tmp).coalesce(1).write.mode(
            "overwrite"
        ).parquet(store)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = sorted(
        (r[0], r[1], r[2]) for r in spark.read.parquet(store).collect()
    )
    assert got_rows == ref_rows


def test_scd2_versions_and_currency(spark, sf_dir) -> None:
    from protarrow_spark.operators.merge import scd2_apply

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).limit(50).localCheckpoint()
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    k = dim.select("c_custkey").orderBy("c_custkey").first()[0]
    ch = spark.createDataFrame(
        [(k, "NEWSEG", "2024-06-01")],
        "c_custkey long, c_mktsegment string, change_ts string",
    ).select("c_custkey", "c_mktsegment", F.col("change_ts").cast("timestamp").alias("change_ts"))
    hist = scd2_apply(dim, ch, "c_custkey")
    assert hist.count() == dim.count() + 1
    versions = hist.filter(F.col("c_custkey") == k).orderBy("valid_from").collect()
    assert len(versions) == 2
    old, new = versions
    assert old["valid_to"] is not None and new["valid_to"] is None
    assert old["valid_to"] == new["valid_from"]
    assert new["c_mktsegment"] == "NEWSEG"
    # exactly one current version per key
    cur = hist.filter(F.col("valid_to").isNull()).groupBy("c_custkey").count()
    assert cur.filter(F.col("count") != 1).count() == 0
