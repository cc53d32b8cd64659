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


# ---------------------------------------------------------------------------
# Sparse random projection (Achlioptas / Johnson-Lindenstrauss)
# ---------------------------------------------------------------------------

#: Default projected dimensionality for the JL transform.
RP_DIM_OUT = 8


def _rp_sign(i: int, j: int) -> int:
    """Sparse-JL matrix entry r[i][j] in {+1, 0, -1} with probability
    {1/6, 2/3, 1/6} (Achlioptas 2003), md5-derived from the (i, j)
    index alone so every engine — and the SQL oracle — regenerates the
    identical matrix with no matrix to ship or broadcast."""
    import hashlib

    m = int(hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()[:15], 16) % 6
    return 1 if m == 0 else (-1 if m == 5 else 0)


def random_projection_exprs(
    qvec_col: str, dim_in: int, dim_out: int = RP_DIM_OUT
) -> list[Column]:
    """Sparse JL projection of an int8-quantized vector (see
    ``operators.similarity.quantize_int8``) as ``dim_out`` integer
    Column expressions p0..p{dim_out-1}.

    All-integer arithmetic (entries in [-127,127], signs in {-1,0,1})
    makes every output EXACT — no float accumulation order to pin, so
    Spark, the SQL oracle, and any reassociating/FMA engine agree
    bit-for-bit. ~2/3 of the matrix is zero, so each output sums only
    ~dim_in/3 terms: pure whole-stage-codegen adds in the scan
    projection, no UDF, no shuffle. Distance distortion follows the JL
    lemma (scale by sqrt(3/dim_out) when absolute distances matter);
    downstream LSH banding / clustering run on dim_out components."""
    out = []
    for j in range(dim_out):
        acc = F.lit(0).cast("bigint")
        for i in range(dim_in):
            s = _rp_sign(i, j)
            if s == 1:
                acc = acc + F.element_at(qvec_col, i + 1)
            elif s == -1:
                acc = acc - F.element_at(qvec_col, i + 1)
        out.append(acc.alias(f"p{j}"))
    return out


def random_projection_sql(
    qvec_expr: str, dim_in: int, dim_out: int = RP_DIM_OUT
) -> str:
    """The oracle-side projection: same md5-derived sign matrix, same
    integer sums, as a select-list fragment."""
    cols = []
    for j in range(dim_out):
        terms = []
        for i in range(dim_in):
            s = _rp_sign(i, j)
            if s == 1:
                terms.append(f"+ {qvec_expr}[{i + 1}]")
            elif s == -1:
                terms.append(f"- {qvec_expr}[{i + 1}]")
        body = " ".join(terms) if terms else "0"
        cols.append(f"CAST(0 {body} AS BIGINT) AS p{j}")
    return ",\n       ".join(cols)
