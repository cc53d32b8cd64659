from protarrow_spark.functions.text import (
    bag_fingerprint,
    text_ngrams,
    tokens,
    word_ngrams,
)
from protarrow_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = [
    "bag_fingerprint",
    "text_ngrams",
    "tokens",
    "word_ngrams",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
