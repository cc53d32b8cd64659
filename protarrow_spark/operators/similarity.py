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

Cost shape: L2 norms are projected ONCE PER VECTOR before any join,
so each candidate pair folds the 64-dim arrays exactly once (the dot
product) instead of three times — at 100 TB the pair side dominates
by orders of magnitude. The float expression tree per pair is
unchanged (dot/(sqrt·sqrt)), so results stay bit-identical to a
single-threaded oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from protarrow_spark.functions.vector import dot, l2_norm, sign_bucket

SIGN_BUCKET_COMPONENTS = 3


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Scale: ``broadcast(queries)`` — each executor scans its corpus
    partition once per batch of queries; corpus norms are projected in
    that same scan pass; ranking is a window over the (tiny) query-id
    partitioning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
            "cosine"
        ),
    )
    return _ranked_topk(scored, k)


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
        l2_norm(F.col(vec_col)).alias("q_norm"),
        sign_bucket(F.col(vec_col), n_components).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        sign_bucket(F.col(vec_col), n_components).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


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

    ``exact=True`` compares all pairs (the verifiable baseline; O(n²)
    — small corpora only); ``exact=False`` restricts to sign-bucket
    collisions, an equi-join that shuffles on the bucket key — the
    scale path (near-dups at high cosine almost always share leading
    signs)."""
    proj = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    a = proj.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    b = proj.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        a = a.withColumn("bucket", sign_bucket(F.col("v_a"), n_components))
        b = b.withColumn("bucket", sign_bucket(F.col("v_b"), n_components))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
