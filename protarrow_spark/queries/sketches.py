"""Sketch-operator queries: KMV distinct counts, CMS heavy hitters.

Every estimate here is *deterministically reproducible* on any engine
(md5-derived hashes), so the DuckDB oracle checks the sketch
machinery bit-for-bit — unlike engine-private HLL++/CMS state, which
can only ever be checked against loose error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
