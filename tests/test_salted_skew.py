"""Salted-join skew behavior: result invariance on a Zipf-hot-key
fact (one key = 20% of rows) and the mechanism fact that salting
spreads the hot key over n_salts shuffle partitions where plain hash
partitioning puts it in ONE (the 1000-executor straggler).

Wall-clock evidence at sf1 lives in benchmarks/BENCH_SKEW_R8.json
(tools/skew_stress.py); this pins the semantics the measurement
relies on.
"""

from __future__ import annotations

import pyspark.sql.functions as F

HOT = 7
N_SALTS = 8


def _zipf_fact(spark, n=5000):
    # ~20% of rows on HOT, rest uniform over 500 keys
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit(HOT))
        .otherwise(F.col("id") % 500)
        .alias("k"),
        (F.col("id") * 13 % 1000).cast("double").alias("v"),
    )


def _dim(spark):
    return spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("p"), F.col("id") % 5).alias("grp")
    )


def test_salted_join_invariant_on_zipf_skew(spark):
    from protarrow_spark.operators.temporal import salted_join

    fact, dim = _zipf_fact(spark), _dim(spark)

    def agg(joined):
        return {
            (r.grp, r.n, str(r.s))
            for r in joined.groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(27,6)")).alias("s"),
            )
            .collect()
        }

    plain = agg(fact.join(dim, "k"))
    salted = agg(salted_join(fact, dim, "k", n_salts=N_SALTS))
    assert plain == salted
    # and the hot key actually dominates: ~20% of fact rows
    hot_n = fact.filter(F.col("k") == HOT).count()
    assert hot_n >= 0.19 * 5000


def test_salting_spreads_hot_key_across_partitions(spark):
    """Under hash(key) partitioning the hot key's rows land in ONE
    shuffle partition (the straggler); under the salted operator's
    hash(key, salt) they spread over >= n_salts/2 distinct partitions
    (xxhash64 collisions across 8 salts into 32 partitions can
    overlap, hence the slack)."""
    fact = _zipf_fact(spark)
    hot = fact.filter(F.col("k") == HOT)
    n_part = 32

    plain_parts = (
        hot.repartition(n_part, "k")
        .withColumn("p", F.spark_partition_id())
        .select("p")
        .distinct()
        .count()
    )
    assert plain_parts == 1, "hash(key) must concentrate the hot key"

    salted_parts = (
        hot.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(N_SALTS)))
        .repartition(n_part, "k", "_salt")
        .withColumn("p", F.spark_partition_id())
        .select("p")
        .distinct()
        .count()
    )
    assert salted_parts >= N_SALTS // 2, (
        f"salting spread hot key over only {salted_parts} partitions"
    )
