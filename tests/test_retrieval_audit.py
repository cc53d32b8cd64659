"""Semantic invariants for the round-6 retrieval/audit additions —
properties the DuckDB parity hash cannot express (the hash proves the
two engines agree; these prove the AGREED answer means what the
docstrings claim).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from protarrow_spark.operators import similarity
from protarrow_spark.queries.pipeline import (
    BM25_TERMS,
    N_QUERY_VECS,
    RRF_DEPTH,
    RRF_K,
    RRF_SCALE,
    RRF_TOPK,
    TOPK_NEIGHBORS,
    ann_ivf_recall_report,
    report_token_fertility,
    retrieval_hybrid_rrf,
)
from protarrow_spark.queries.relational import dq_drift_splithalf
from protarrow_spark.sources.tables import table


def test_ivf_recall_bounded_and_counts_consistent(spark, sf_dir) -> None:
    rows = ann_ivf_recall_report(spark, sf_dir).collect()
    assert len(rows) == N_QUERY_VECS
    for r in rows:
        assert 0 <= r.n_hits <= r.n_truth <= TOPK_NEIGHBORS
        assert abs(r.recall_at_k - r.n_hits / r.n_truth) < 1e-12


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir) -> None:
    """Probing EVERY cell must recover exact brute-force truth — the
    recall audit's own ground-truth sanity check."""
    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 2)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, qs, k=3).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_ivf(
            emb, qs, k=3, nprobe=similarity.IVF_N_CELLS
        ).collect()
    }
    assert full == truth


def test_rrf_score_formula_and_order(spark, sf_dir) -> None:
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOPK
    scores = [r.rrf_fp for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        expect = 0
        if r.sparse_rank is not None:
            assert 1 <= r.sparse_rank <= RRF_DEPTH
            expect += RRF_SCALE // (RRF_K + r.sparse_rank)
        if r.dense_rank is not None:
            assert 1 <= r.dense_rank <= RRF_DEPTH
            expect += RRF_SCALE // (RRF_K + r.dense_rank)
        assert r.sparse_rank is not None or r.dense_rank is not None
        assert r.rrf_fp == expect


def test_rrf_fuses_both_rankers(spark, sf_dir) -> None:
    """The fused list must actually draw on both rankings: the #1 docs
    of the sparse and dense lists both survive into the fused top-k
    (each holds the maximum achievable contribution from its side)."""
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert any(r.sparse_rank == 1 for r in rows)
    assert any(r.dense_rank == 1 for r in rows)


def test_token_fertility_totals_match_corpus(spark, sf_dir) -> None:
    """Group sums must reconcile with ungrouped corpus totals (no doc
    dropped or double-counted by the (source, lang) breakdown)."""
    rep = report_token_fertility(spark, sf_dir)
    got = rep.agg(
        F.sum("n_docs").alias("d"),
        F.sum("n_chars").alias("c"),
        F.sum("n_ws_tokens").alias("w"),
    ).collect()[0]
    docs = table(spark, sf_dir, "documents")
    exp = docs.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.length("text")).alias("c"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("w"),
    ).collect()[0]
    assert (got.d, got.c, got.w) == (exp.d, exp.c, exp.w)
    for r in rep.collect():
        assert r.fertility >= 1.0  # BPE pre-tokens never merge across spaces


def test_drift_splithalf_partitions_every_event(spark, sf_dir) -> None:
    rows = dq_drift_splithalf(spark, sf_dir).collect()
    total = sum(r.n_first_half + r.n_second_half for r in rows)
    n_events = table(spark, sf_dir, "events").count()
    assert total == n_events
    for r in rows:
        assert r.chi2_term >= 0.0
        assert r.drifted == (r.chi2_term > 3.841)


def test_bm25_terms_nonempty() -> None:
    assert len(BM25_TERMS) >= 2  # fusion needs a real multi-term query
