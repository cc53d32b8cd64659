from protarrow_spark.operators import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
