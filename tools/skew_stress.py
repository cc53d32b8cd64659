"""Skew-stress for salted_join (r6/r7 brief carry-over): measure the
plain-vs-salted wall ratio on a Zipf-hot-key fact table at sf1 scale
and prove result invariance + straggler elimination.

Dataset: benchmarks/data/sf1 lineitem (~6M rows) with HALF the rows
REMAPPED onto ONE hot order key (deterministic: l_orderkey % 2 == 0
-> HOT_KEY), joined to sf1 orders. That is the shape AQE's skew split
handles only when it may split (sort-merge, post-shuffle); salting is
the result-invariant insurance when it can't (single key above any
split threshold, pre-partitioned layouts, or an aggregation keyed on
the same hot key downstream).

Measured variants (each best-of-2, noop sink):
  plain_aqe_skew   — plain equi-join, AQE skew-join ON (the default)
  plain_no_skew    — plain equi-join, AQE skew-join OFF (the
                     1000-executor straggler case: one task owns half
                     of the shuffle)
  salted           — operators.temporal.salted_join, AQE skew-join OFF

Also records:
  * result equality: row count + decimal-exact aggregate identical
    across all three variants (salting must be invisible);
  * straggler evidence: max shuffle-partition row share for the hot
    key under hash(key) vs hash(key, salt) partitioning — the
    plan-shape fact that the salted form spreads the hot key over
    n_salts partitions.

Writes benchmarks/BENCH_SKEW_R8.json.

Usage: PYTHONPATH=. python tools/skew_stress.py [sf1_dir]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HOT_KEY = 42
N_SALTS = 8


def main() -> None:
    import pyspark.sql.functions as F

    from protarrow_spark.operators.temporal import salted_join
    from protarrow_spark.session import get_spark

    sf1 = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "benchmarks/data/sf1")
    spark = get_spark("skew-stress", cpus=32)

    def zipf_fact():
        li = spark.read.parquet(f"{sf1}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        # one hot key owns ~half the fact side — at 100 TB that is a
        # multi-TB single shuffle partition; at sf1 it is 3M rows in
        # one task, enough for the straggler to dominate the join
        # stage wall on local[32]
        return li.withColumn(
            "o_orderkey",
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(HOT_KEY)).otherwise(
                F.col("l_orderkey")
            ),
        ).drop("l_orderkey")

    orders = spark.read.parquet(f"{sf1}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("sum_price"),
        )

    def run(label, build, skew_on):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            agg(build()).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        print(f"{label}: {best:.2f}s", file=sys.stderr)
        return round(best, 3)

    fact, dim = zipf_fact(), orders
    timings = {
        "plain_aqe_skew": run(
            "plain_aqe_skew", lambda: fact.join(dim, "o_orderkey"), True
        ),
        "plain_no_skew": run(
            "plain_no_skew", lambda: fact.join(dim, "o_orderkey"), False
        ),
        "salted": run(
            "salted",
            lambda: salted_join(fact, dim, "o_orderkey", n_salts=N_SALTS),
            False,
        ),
    }

    # ---- result invariance: all three variants byte-identical ----
    def canon(joined):
        rows = agg(joined).collect()
        return sorted((r.o_orderpriority, r.n_items, str(r.sum_price)) for r in rows)

    base = canon(fact.join(dim, "o_orderkey"))
    assert canon(salted_join(fact, dim, "o_orderkey", n_salts=N_SALTS)) == base, (
        "salted join changed results"
    )
    # ---- straggler evidence: hot-key share of the biggest shuffle
    # partition under plain vs salted partitioning ----
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def max_hot_share(cols):
        hot = fact.filter(F.col("o_orderkey") == HOT_KEY)
        dist = (
            hot.repartition(n_part, *[F.col(c) for c in cols])
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .count()
            .collect()
        )
        total = sum(r["count"] for r in dist)
        return max(r["count"] for r in dist) / total, len(dist)

    lhs = fact.withColumn(
        "_salt", F.pmod(F.xxhash64("l_extendedprice"), F.lit(N_SALTS))
    )
    plain_share, plain_parts = max_hot_share(["o_orderkey"])
    # emulate the salted operator's partitioning: (key, salt)
    hot_salted = (
        lhs.filter(F.col("o_orderkey") == HOT_KEY)
        .repartition(n_part, F.col("o_orderkey"), F.col("_salt"))
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    tot = sum(r["count"] for r in hot_salted)
    salted_share, salted_parts = (
        max(r["count"] for r in hot_salted) / tot,
        len(hot_salted),
    )

    n_fact = fact.count()
    hot_n = fact.filter(F.col("o_orderkey") == HOT_KEY).count()
    payload = {
        "metric": "salted_join_skew_stress",
        "sf1_dir": sf1,
        "n_fact_rows": n_fact,
        "hot_key_rows": hot_n,
        "hot_key_share": round(hot_n / n_fact, 4),
        "n_salts": N_SALTS,
        "timings_sec": timings,
        "ratio_plain_no_skew_vs_salted": round(
            timings["plain_no_skew"] / timings["salted"], 2
        ),
        "results_identical": True,
        "hot_key_max_partition_share_plain": round(plain_share, 4),
        "hot_key_partitions_plain": plain_parts,
        "hot_key_max_partition_share_salted": round(salted_share, 4),
        "hot_key_partitions_salted": salted_parts,
    }
    out = REPO / "benchmarks" / "BENCH_SKEW_R8.json"
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
