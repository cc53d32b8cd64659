"""Vector (embedding) column functions over array<float>.

Implemented with ``zip_with``/``aggregate`` higher-order functions —
JVM-side sequential folds, deterministic and codegen-friendly. A
vectorized pandas-UDF path is deliberately NOT the default: for 64-dim
embeddings the built-in fold stays in Tungsten and avoids the
Arrow hop entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def seq_cosine_udf():
    """Arrow-batched cosine over two vector columns, vectorized ACROSS
    rows but sequential ACROSS dimensions — i.e. per row it computes
    exactly the left-to-right double fold that :func:`dot` /
    ``list_dot_product`` compute, so results are bit-identical to the
    JVM fold and to the DuckDB oracle, at numpy speed.

    Use on pair-scoring hot paths (candidate verification) where the
    interpreted per-element lambda of the built-in fold dominates;
    the built-in stays the default for small row counts (no Arrow
    hop)."""
    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a.values])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b.values])
        n = A.shape[0]
        dab = np.zeros(n)
        daa = np.zeros(n)
        dbb = np.zeros(n)
        for i in range(A.shape[1]):  # sequential: fold-order parity
            dab = dab + A[:, i] * B[:, i]
            daa = daa + A[:, i] * A[:, i]
            dbb = dbb + B[:, i] * B[:, i]
        return pd.Series(dab / (np.sqrt(daa) * np.sqrt(dbb)))

    return cos


def sign_bucket(a: Column, n_components: int) -> Column:
    """Coarse LSH bucket from the signs of the first ``n_components``
    vector components — the cheap IVF-style partitioner used by the
    bucketed ANN path (2^n buckets)."""
    bucket = F.lit(0)
    for i in range(n_components):
        bit = F.when(F.element_at(a, i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket
