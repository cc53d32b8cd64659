"""Every registered query with an oracle must hash-match DuckDB —
exactly the driver's t2 gate, run locally."""

from __future__ import annotations

import pytest

from protarrow_spark.queries import all_oracles, all_queries
from tests.oracle_utils import assert_matches_oracle

ORACLE_NAMES = sorted(all_oracles())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    missing_oracle = set(all_queries()) - set(all_oracles())
    for name in sorted(missing_oracle):
        df = all_queries()[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_kmeans_tolerance_vs_oracle(spark, sf_dir):
    """The one rows-only registry entry gets a VALUE gate here:
    population counts exact vs the unrolled DuckDB Lloyd's replica,
    centroid coordinates within epsilon (r11 verdict item #5)."""
    from tests.oracle_utils import kmeans_tolerance_report

    rep = kmeans_tolerance_report(spark, sf_dir)
    assert rep["rows_match"], rep
    assert rep["counts_exact"], rep
    assert rep["centroid_max_abs_diff"] < rep["eps"], rep


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
