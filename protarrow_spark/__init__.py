"""protarrow-spark: a PySpark-native analytics engine.

Re-expresses the full capability surface of tradewelltech/protarrow
(protobuf <-> columnar conversion; reference at /root/reference,
``protarrow/__init__.py:14-26``) on Spark DataFrames, and layers the
query + LLM-data-pipeline operators on top (SURVEY.md §2).

Design is Spark-first: logical plans are declared with the DataFrame /
SQL API so Catalyst/Tungsten choose the physical strategy; Python only
runs driver-side (schema derivation) or in Arrow-batched UDFs where
built-ins genuinely can't express the semantics (proto wire decode).
"""

from __future__ import annotations

__version__ = "0.1.0"

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.session import get_spark

__all__ = [
    "ProtarrowSparkConfig",
    "get_spark",
    "__version__",
]
