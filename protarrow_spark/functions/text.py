"""Text column functions — all JVM built-ins (no Python in the row
path) so they stay inside whole-stage codegen at 100 TB.

The reference has no text surface (SURVEY.md §2.2); these implement
the north-star LLM-pipeline text layer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string>.

    Docs shorter than ``n`` tokens collapse to one whole-text shingle,
    so every document has at least one shingle (keeps Jaccard defined).

    Kept as the array-input reference implementation; the hot shingle
    path is :func:`text_ngrams`, which extracts the same grams from
    the raw text column with one codegen'd regex pass (~3.4x faster
    than this interpreted higher-order ``transform``/``slice`` chain).
    """
    joined_all = F.array(F.concat_ws(" ", toks))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(joined_all)


def text_ngrams(text: Column, n: int) -> Column:
    """Overlapping word n-grams straight from a single-space-separated
    text column: one JVM regex pass (lookahead capture anchored at
    token starts) instead of split + interpreted per-position slicing.
    Equals ``word_ngrams(tokens(text), n)`` on single-space-separated
    input, including the short-doc whole-text fallback."""
    pattern = r"(?<=^|\s)(?=(" + " ".join([r"\S+"] * n) + r"))"
    grams = F.regexp_extract_all(text, F.lit(pattern), 1)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(text))


def bag_fingerprint(toks: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token bag."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
