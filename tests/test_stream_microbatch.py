"""Multi-micro-batch equivalence for EVERY registered streaming query.

The Structured Streaming contract is that a query's completed output
is invariant to how the source backlog is split into micro-batches.
Each registered ``stream_*`` query runs under ``availableNow`` and is
oracle-compared assuming the whole backlog lands in one batch; this
module FORCES >=2 micro-batches (events rewritten as a 2-file
directory + ``maxFilesPerTrigger=1``) and asserts the result is
row-for-row identical to the single-batch run — closing the class of
bug the round-5 driver hit on ``stream_stateful_user_totals`` (an
update-mode sink readout that was only correct for a 1-batch backlog).
"""

from __future__ import annotations

import os
import shutil

import pytest

import protarrow_spark.queries.streaming as streaming_mod
from protarrow_spark.queries.registry import all_queries

STREAM_QUERIES = sorted(n for n in all_queries() if n.startswith("stream_"))


@pytest.fixture(scope="module")
def split_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """A copy of the sf dir whose streamed tables (events, documents)
    are 2-file parquet directories, so ``maxFilesPerTrigger=1`` yields
    >=2 micro-batches for every registered stream source."""
    split = ("events.parquet", "documents.parquet")
    dst = tmp_path_factory.mktemp("sf_split")
    for name in os.listdir(sf_dir):
        if name not in split:
            shutil.copy(os.path.join(sf_dir, name), dst / name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in split:
        df = spark.read.parquet(os.path.join(sf_dir, name))
        df.repartition(2).write.parquet(str(dst / name))
    return str(dst)


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_stream_query_invariant_to_microbatching(
    spark, sf_dir, split_sf_dir, name
) -> None:
    q = all_queries()[name]

    def canon(df):
        # repr-keyed sort: canonical and total even with NULL group
        # keys (None < str comparisons raise)
        return sorted(map(tuple, df.collect()), key=repr)

    expected = canon(q(spark, sf_dir))
    assert expected  # the single-batch baseline is non-trivial

    streaming_mod.FORCE_MAX_FILES_PER_TRIGGER = 1
    try:
        got = canon(q(spark, split_sf_dir))
    finally:
        streaming_mod.FORCE_MAX_FILES_PER_TRIGGER = None
    assert got == expected


def test_stateful_totals_sink_saw_multiple_batches(
    spark, split_sf_dir
) -> None:
    """The forcing fixture really forces >=2 micro-batches: the
    update-mode sink must hold MORE emissions than distinct keys
    (keys spanning both files emit once per batch), while the
    snapshot readout still collapses to one row per key."""
    q = all_queries()["stream_stateful_user_totals"]
    streaming_mod.FORCE_MAX_FILES_PER_TRIGGER = 1
    try:
        out = q(spark, split_sf_dir)
        n_keys = out.count()
        sink_rows = spark.table("mem_stream_stateful_user_totals").count()
    finally:
        streaming_mod.FORCE_MAX_FILES_PER_TRIGGER = None
    assert sink_rows > n_keys


def test_py_text_ngrams_matches_jvm_on_irregular_whitespace(spark):
    """The streaming decontamination scorer's Python shingler must
    produce the exact gram set functions.text.text_ngrams produces
    (ADVICE r12: the old char-span slicer diverged on multi-space /
    tab / newline separators and str()-coerced NULL to 'None')."""
    import pyspark.sql.functions as F

    from protarrow_spark.functions.text import text_ngrams
    from protarrow_spark.queries.streaming import _py_text_ngrams

    texts = [
        "plain single space separated tokens here",
        "double  space",
        "tab\tseparated\ttokens and a normal gap",
        "newline\nbroken doc with more tokens after",
        "short",
        "",
        "  leading and trailing  ",
        "exactly three toks",
        "a b",
        None,
        "mixed   runs \t of\n whitespace between these tokens",
        "nbsp\xa0joined tokens stay together here",
    ]
    n = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    jvm = {
        r["i"]: set(r["g"])
        for r in df.select(
            "i", text_ngrams(F.col("text"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        got = _py_text_ngrams(t, n)
        exp = jvm.get(i, set())
        exp = {g for g in exp if g is not None}
        assert got == exp, f"text={t!r}: python={got} jvm={exp}"
