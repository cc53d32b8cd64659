"""Vector (embedding) column functions over array<float>.

Implemented with ``zip_with``/``aggregate`` higher-order functions —
JVM-side sequential folds, deterministic and codegen-friendly. A
vectorized pandas-UDF path is deliberately NOT the default: for 64-dim
embeddings the built-in fold stays in Tungsten and avoids the
Arrow hop entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    """Dot product with per-element cast to double; left-to-right fold
    so the result is bit-identical to a single-threaded oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column, n_components: int) -> Column:
    """Coarse LSH bucket from the signs of the first ``n_components``
    vector components — the cheap IVF-style partitioner used by the
    bucketed ANN path (2^n buckets)."""
    bucket = F.lit(0)
    for i in range(n_components):
        bit = F.when(F.element_at(a, i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket
