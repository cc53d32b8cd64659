"""Similarity search over embedding columns (array<float>).

North-star LLM-pipeline operators (not in the reference, SURVEY §2.2).
Two paths:

* brute-force cosine top-k — the exact baseline; a broadcast of the
  (small) query set against the full corpus, so the corpus never
  shuffles and the plan scales linearly with corpus size.
* sign-bucket LSH ANN — coarse IVF-style partitioning by the signs of
  the first ``n_components`` dimensions; probes only the query's own
  bucket, turning all-pairs into an equi-join. Recall is approximate,
  cost drops ~2^n.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from protarrow_spark.functions.vector import cosine_similarity, sign_bucket

SIGN_BUCKET_COMPONENTS = 3


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Scale: ``broadcast(queries)`` — each executor scans its corpus
    partition once per batch of queries; ranking is a window over the
    (tiny) query-id partitioning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_components: int = SIGN_BUCKET_COMPONENTS,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    sign-bucket (2^n_components buckets), then exact cosine rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), n_components).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), n_components).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_components: int = SIGN_BUCKET_COMPONENTS,
    exact: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).

    ``exact=True`` compares all pairs (the verifiable baseline);
    ``exact=False`` restricts to sign-bucket collisions — the scale
    path (near-dups at cosine >= 0.95 almost always share leading
    signs)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        a = a.withColumn("bucket", sign_bucket(F.col("v_a"), n_components))
        b = b.withColumn("bucket", sign_bucket(F.col("v_b"), n_components))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", cosine_similarity(F.col("v_a"), F.col("v_b")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
