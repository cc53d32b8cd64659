"""The hash-sampled LSH recall report must track the full-corpus one.

At 100 TB the recall audit's exact-Jaccard truth side is the expensive
half, so ``dedup_lsh_recall_sampled`` restricts BOTH sides to a
deterministic md5 stratum of documents. These tests pin (a) that the
stratum really shrinks the work, (b) that the sampled estimate tracks
the full-corpus recall at sf0.01, and (c) that the doc-level predicate
equals pair-level both-endpoints membership (the unbiasedness
argument's load-bearing step).
"""

from __future__ import annotations

import pytest

from protarrow_spark.queries import all_queries

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def reports(spark):
    full = all_queries()["dedup_lsh_recall_report"](spark, SF001).collect()[0]
    samp = all_queries()["dedup_lsh_recall_sampled"](spark, SF001).collect()[0]
    return full.asDict(), samp.asDict()


def test_sampled_stratum_is_nontrivial_and_smaller(reports):
    full, samp = reports
    assert samp["n_truth"] >= 1
    assert samp["n_truth"] < full["n_truth"]
    assert samp["n_cand"] < full["n_cand"]


def test_sampled_recall_tracks_full(reports):
    full, samp = reports
    assert abs(samp["recall"] - full["recall"]) <= 0.25
    assert abs(samp["candidate_precision"] - full["candidate_precision"]) <= 0.25


def test_stratum_pairs_are_both_endpoint_membership(spark):
    """Every sampled truth pair's endpoints are in the doc stratum, and
    every full-corpus truth pair with both endpoints in the stratum is
    in the sampled truth set (no pair-level distortion)."""
    import pyspark.sql.functions as F

    from protarrow_spark.operators import dedup
    from protarrow_spark.queries.pipeline import (
        LSH_RECALL_SAMPLE_MOD,
        LSH_RECALL_T,
    )
    from protarrow_spark.sources.tables import table

    docs = table(spark, SF001, "documents")
    key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    stratum = {
        r.doc_id
        for r in docs.filter(key % LSH_RECALL_SAMPLE_MOD == 0)
        .select("doc_id")
        .collect()
    }
    full_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=LSH_RECALL_T, n=dedup.NGRAM_N
        )
        .select("doc_a", "doc_b")
        .collect()
    }
    sampled_docs = docs.filter(key % LSH_RECALL_SAMPLE_MOD == 0)
    sampled_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            sampled_docs, "doc_id", "text", threshold=LSH_RECALL_T, n=dedup.NGRAM_N
        )
        .select("doc_a", "doc_b")
        .collect()
    }
    both_in = {
        (a, b) for a, b in full_pairs if a in stratum and b in stratum
    }
    assert sampled_pairs == both_in
