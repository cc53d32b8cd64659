"""Sketch-operator queries: KMV distinct counts, CMS heavy hitters.

Every estimate here is *deterministically reproducible* on any engine
(md5-derived hashes), so the DuckDB oracle checks the sketch
machinery bit-for-bit — unlike engine-private HLL++/CMS state, which
can only ever be checked against loose error bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from protarrow_spark.operators import sketches
from protarrow_spark.queries.registry import query
from protarrow_spark.sources.tables import table


@query(
    "sketch_kmv_distinct",
    oracle=sketches.kmv_distinct_oracle_sql("events", "event_type", "user_id"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct users per event type (k=64)."""
    return sketches.kmv_distinct(table(spark, sf_dir, "events"), "event_type", "user_id")


@query(
    "sketch_cms_heavy_hitters",
    oracle=sketches.cms_heavy_hitters_oracle_sql("events", "user_id"),
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch top-20 users by estimated event count (d=4,
    w=256), true counts alongside to expose collision inflation."""
    return sketches.cms_heavy_hitters(table(spark, sf_dir, "events"), "user_id")


@query(
    "sketch_histogram_quantiles",
    oracle=sketches.histogram_quantiles_oracle_sql("events", "event_type", "value"),
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90 of event value per type from a 1024-bin
    mergeable histogram (error <= one bin width; single-IEEE-op
    arithmetic so the estimate is engine-exact)."""
    return sketches.histogram_quantiles(table(spark, sf_dir, "events"), "event_type", "value")


def _kmv_set_ops_oracle() -> str:
    from protarrow_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        KMV_K,
        KMV_SPACE,
        _hex_to_long_sql,
    )

    k = KMV_K
    h = _hex_to_long_sql("md5(CAST(user_id AS VARCHAR))", KMV_HEX_DIGITS)

    def est_cte(src: str, name: str) -> str:
        return f"""
r_{name} AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM {src}
),
e_{name} AS (
  SELECT COUNT(*) AS n, MAX(CASE WHEN rn = {k} THEN h END) AS hk
  FROM r_{name} WHERE rn <= {k}
)"""

    est = (
        lambda nm: f"CASE WHEN e_{nm}.n < {k} THEN CAST(e_{nm}.n AS DOUBLE) "
        f"ELSE {float(k - 1)} / (CAST(e_{nm}.hk AS DOUBLE) / {KMV_SPACE}) END"
    )
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'click'),
hb AS (SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'purchase'),
hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
{est_cte('ha', 'a')},
{est_cte('hb', 'b')},
{est_cte('hu', 'u')}
SELECT {est('a')} AS est_click,
       {est('b')} AS est_purchase,
       {est('u')} AS est_union,
       ({est('a')} + {est('b')}) - {est('u')} AS est_intersect
FROM e_a, e_b, e_u
"""


@query("sketch_kmv_set_ops", oracle=_kmv_set_ops_oracle())
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra: distinct-user estimates for two event
    types, their union (exact sketch merge — k minima of the merged
    hash sets), and the intersection via inclusion-exclusion. The
    operation a 100 TB audience-overlap / cross-dataset-leakage
    rollup runs on sketch STATE (k 60-bit hashes per set) instead of
    the user sets themselves; sketches built per partition/day/source
    merge associatively to the same state.

    Scale: each sketch build is one distinct + WindowGroupLimit-pruned
    window (k rows per group survive map-side); the merge moves only
    sketch state. All estimates share the oracle's exact arithmetic."""
    from protarrow_spark.operators.sketches import (
        KMV_K,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    ev = table(spark, sf_dir, "events")

    def sk(event_type: str):
        side = ev.filter(F.col("event_type") == event_type).select(
            F.lit("p").alias("g"), F.col("user_id")
        )
        return kmv_sketch(side, "g", "user_id", k=KMV_K)

    sa, sb = sk("click"), sk("purchase")
    su = kmv_merge(sa, sb, "g", k=KMV_K)
    ea = kmv_estimate(sa, "g", k=KMV_K).withColumnRenamed("est_distinct", "est_click")
    eb = kmv_estimate(sb, "g", k=KMV_K).withColumnRenamed("est_distinct", "est_purchase")
    eu = kmv_estimate(su, "g", k=KMV_K).withColumnRenamed("est_distinct", "est_union")
    out = ea.join(eb, "g").join(eu, "g")
    return out.select(
        "est_click",
        "est_purchase",
        "est_union",
        ((F.col("est_click") + F.col("est_purchase")) - F.col("est_union")).alias(
            "est_intersect"
        ),
    )


@query(
    "sketch_hll_distinct",
    oracle=sketches.hll_distinct_oracle_sql("events", "event_type", "user_id"),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type (p=8, m=256) with a
    fully portable register layout: md5-derived register index + rho,
    MAX-mergeable state (256 small ints per group regardless of input
    size — the sketch KMV can't give when per-group state must stay
    constant), and an exact-integer harmonic denominator so the
    estimate is bit-identical on any engine."""
    return sketches.hll_distinct(table(spark, sf_dir, "events"), "event_type", "user_id")


# ---------------------------------------------------------------------------
# sketch_error_report — measured sketch error vs exact truth
# ---------------------------------------------------------------------------


def _sketch_error_oracle() -> str:
    hll = sketches.hll_distinct_oracle_sql("events", "event_type", "user_id")
    kmv = sketches.kmv_distinct_oracle_sql("events", "event_type", "user_id")
    return f"""
WITH exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       h.est_distinct AS hll_est,
       k.est_distinct AS kmv_est,
       (h.est_distinct - CAST(e.exact_distinct AS DOUBLE))
         / CAST(e.exact_distinct AS DOUBLE) AS hll_rel_err,
       (k.est_distinct - CAST(e.exact_distinct AS DOUBLE))
         / CAST(e.exact_distinct AS DOUBLE) AS kmv_rel_err
FROM exact e
JOIN ({hll}) h ON h.event_type = e.event_type
JOIN ({kmv}) k ON k.event_type = e.event_type
"""


@query("sketch_error_report", oracle=_sketch_error_oracle())
def sketch_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured sketch error: per event type, exact distinct users
    next to the HLL (p=8) and KMV (k=64) estimates and their signed
    relative errors — the audit that tells you whether a sketch's
    error budget actually holds on YOUR key distribution before you
    trust it at 100 TB (completing the audit family: LSH recall, IVF
    recall, now sketch error). Estimates are the engine's own
    bit-exact sketch operators; errors are fixed IEEE expression
    trees on exact integers.

    The audit earns its keep immediately: at the gate SF it measures
    the raw HLL estimator's documented small-range bias (+79% at 150
    distinct — below the 2.5m threshold where standard HLL switches
    to linear counting, a correction this engine deliberately omits
    because its m*ln(m/V) term is libm-dependent and would break
    bit-exact cross-engine parity) while KMV stays within -3.4%. The
    operational guidance the numbers encode: use KMV under ~m
    distinct, HLL above.

    Scale: the exact side is one distinct-aggregate (the expensive
    truth — run it on a sampled stratum or a single day at scale, the
    same prescription as the other audits); the sketch sides move
    constant-size state. The |types|-row frames join broadcast."""
    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    hll = sketches.hll_distinct(ev, "event_type", "user_id").select(
        "event_type", F.col("est_distinct").alias("hll_est")
    )
    kmv = sketches.kmv_distinct(ev, "event_type", "user_id").select(
        "event_type", F.col("est_distinct").alias("kmv_est")
    )
    exd = F.col("exact_distinct").cast("double")
    return (
        exact.join(F.broadcast(hll), "event_type")
        .join(F.broadcast(kmv), "event_type")
        .select(
            "event_type",
            "exact_distinct",
            "hll_est",
            "kmv_est",
            ((F.col("hll_est") - exd) / exd).alias("hll_rel_err"),
            ((F.col("kmv_est") - exd) / exd).alias("kmv_rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_quantile_bottomk — mergeable sample-quantile sketch + rank audit
# ---------------------------------------------------------------------------


def _bottomk_quantile_oracle() -> str:
    est = sketches.bottomk_quantiles_oracle_sql(
        "(SELECT * FROM events WHERE value IS NOT NULL)",
        "event_type", "value", "event_id",
    )
    return f"""
WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v, event_id
            FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
exact AS (
  SELECT event_type, ANY_VALUE(n) AS n,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS exact_q50,
         MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN v END) AS exact_q90
  FROM ranked GROUP BY event_type
),
est AS ({est}),
err AS (
  SELECT e.event_type,
         SUM(CASE WHEN ev.v <= e.est_q50 THEN 1 ELSE 0 END) AS le50,
         SUM(CASE WHEN ev.v <= e.est_q90 THEN 1 ELSE 0 END) AS le90
  FROM est e JOIN ev ON ev.event_type = e.event_type
  GROUP BY e.event_type
)
SELECT x.event_type,
       CAST(x.n AS BIGINT) AS n_rows,
       x.exact_q50, s.est_q50,
       CAST(r.le50 AS DOUBLE) / x.n - 0.5 AS rank_err_q50,
       x.exact_q90, s.est_q90,
       CAST(r.le90 AS DOUBLE) / x.n - 0.9 AS rank_err_q90
FROM exact x
JOIN est s ON s.event_type = x.event_type
JOIN err r ON r.event_type = x.event_type
"""


@query("sketch_quantile_bottomk", oracle=_bottomk_quantile_oracle())
def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sample-quantile sketch + its rank-error audit (r8,
    completing the sketch family: distinct -> KMV/HLL, frequency ->
    CMS, quantiles -> fixed-bin histogram and now BOTTOM-K).

    The sketch keeps the k=256 rows with smallest md5(id) per group —
    a deterministic uniform sample whose bottom-k-of-union merge is
    exactly KMV's (shards sketch independently; a coordinator merges
    k-sized states), and whose q-quantile estimate is the ceil(q*m)-th
    smallest sampled value: rank error O(sqrt(q(1-q)/k)) with no
    data-dependent merge order, so the oracle reproduces every
    estimate bit-for-bit where t-digest/KLL could not be hash-gated.
    Next to the estimates, the audit computes the EXACT q50/q90 (one
    windowed rank per group) and the realized rank error of each
    estimate (share of values <= estimate, minus q) — the measurement
    that says whether the k=256 budget holds on THIS distribution
    before trusting it at 100 TB.

    Scale: the sketch side is one WindowGroupLimit (rank <= k prunes
    partition-locally before the shuffle) + k-bounded per-group sorts;
    the exact side is the audit's truth (one full sort per group —
    run it on a sampled stratum at scale, as with the other audits);
    the rank-error join broadcasts |groups| rows."""
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", F.col("value").cast("double").alias("v"), "event_id")
    )
    est = sketches.bottomk_quantiles(ev, "event_type", "v", "event_id")
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    exact = ranked.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")), F.col("v")
            )
        ).alias("exact_q50"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")), F.col("v")
            )
        ).alias("exact_q90"),
    )
    err = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") <= F.col("est_q50"), 1).otherwise(0)).alias("le50"),
            F.sum(F.when(F.col("v") <= F.col("est_q90"), 1).otherwise(0)).alias("le90"),
        )
    )
    return (
        exact.join(F.broadcast(est), "event_type")
        .join(F.broadcast(err), "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_rows"),
            "exact_q50",
            "est_q50",
            (F.col("le50").cast("double") / F.col("n") - 0.5).alias("rank_err_q50"),
            "exact_q90",
            "est_q90",
            (F.col("le90").cast("double") / F.col("n") - 0.9).alias("rank_err_q90"),
        )
    )
