"""Query modules register themselves on import (see registry.py)."""

import protarrow_spark.queries.conversion  # noqa: F401
import protarrow_spark.queries.multimodal  # noqa: F401
import protarrow_spark.queries.pipeline  # noqa: F401
import protarrow_spark.queries.relational  # noqa: F401
import protarrow_spark.queries.sketches  # noqa: F401
import protarrow_spark.queries.streaming  # noqa: F401
import protarrow_spark.queries.tpch_extra  # noqa: F401

from protarrow_spark.queries.registry import QUERIES, ORACLES, all_oracles, all_queries, query

__all__ = ["QUERIES", "ORACLES", "all_queries", "all_oracles", "query"]
