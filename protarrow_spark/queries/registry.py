"""Registry mapping SURVEY.md §2 operator inventory to runnable queries.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable, optionally
paired with a DuckDB-runnable ANSI-SQL oracle producing identical
column names and values. The driver compares the two at sf=0.01
(row-count + schema + order-insensitive value hash).

Determinism rules every query here follows:

* Floating-point aggregates go through exact decimal sums
  (``CAST(x AS DECIMAL)`` before ``SUM``) so results do not depend on
  partitioning / accumulation order — mandatory for a distributed
  engine to hash-match a single-threaded oracle.
* Every ``LIMIT``/top-k has a total-order tiebreaker.
* Session timezone is pinned to UTC before running.
"""

from __future__ import annotations

import functools
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (or None
    for non-SQL-expressible operators -> weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # events.parquet carries TIMESTAMP(NANOS); read as long nanos
            # (sources/tables.py converts to µs TimestampType).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import side-effect populates the registry.
    import protarrow_spark.queries  # noqa: F401

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import protarrow_spark.queries  # noqa: F401

    return dict(ORACLES)
