"""Unit tests for the round-4 operator families: HyperLogLog distinct
sketch, fixed-point PageRank, linear quality-classifier scoring, and
compaction bin planning. Value parity with the DuckDB oracles is
covered by tests/test_oracle_parity.py; these pin the algebraic
properties the oracles can't express (mergeability, convergence, bin
invariants, error bounds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from protarrow_spark.operators.graph import PAGERANK_SCALE, pagerank
from protarrow_spark.operators.layout import compaction_bins
from protarrow_spark.operators.scoring import linear_quality_scores
from protarrow_spark.operators.sketches import HLL_M, hll_distinct, hll_registers
from protarrow_spark.sources.tables import table


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_estimate_within_error_bound(spark, sf_dir) -> None:
    """The operator ships the RAW estimate plus the zero-register count;
    the standard small-range linear-counting correction (which needs
    libm ln() and is therefore left out of the engine-portable columns)
    is the caller's policy — applied here exactly as HLL prescribes."""
    import math

    ev = table(spark, sf_dir, "events")
    est = {
        r["event_type"]: (r["est_distinct"], r["n_zero_registers"])
        for r in hll_distinct(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, (raw, zeros) in est.items():
        e = raw
        if raw <= 2.5 * HLL_M and zeros > 0:
            e = HLL_M * math.log(HLL_M / zeros)
        # p=8 gives ~1.04/sqrt(256) = 6.5% typical error; allow ~4 sigma.
        assert abs(e - exact[k]) / exact[k] < 0.30, (k, e, exact[k])


def test_hll_registers_merge_by_max(spark, sf_dir) -> None:
    """Sketch of a union == register-wise MAX of the parts' sketches —
    the mergeability that lets per-day/per-source sketches roll up."""
    ev = table(spark, sf_dir, "events").withColumn("g", F.lit("all"))
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    whole = {
        (r["register"]): r["r"] for r in hll_registers(ev, "g", "user_id").collect()
    }
    ra = {r["register"]: r["r"] for r in hll_registers(half_a, "g", "user_id").collect()}
    rb = {r["register"]: r["r"] for r in hll_registers(half_b, "g", "user_id").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == whole


def test_hll_state_is_bounded(spark, sf_dir) -> None:
    regs = hll_registers(table(spark, sf_dir, "events"), "event_type", "user_id")
    per_group = regs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] <= HLL_M for r in per_group)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def toy_edges(spark):
    # 1 -> 2, 2 -> 1, 3 -> 1 : node 1 must outrank 2, 2 outrank 3.
    return spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], ["src", "dst"]
    )


def test_pagerank_ordering_and_base(spark, toy_edges) -> None:
    ranks = {r["node"]: r["rank"] for r in pagerank(toy_edges, "src", "dst").collect()}
    assert set(ranks) == {1, 2, 3}
    assert ranks[1] > ranks[2] > ranks[3]
    # A node with no in-edges holds exactly the base mass 0.15.
    assert ranks[3] == (15 * PAGERANK_SCALE) // 100


def test_pagerank_deterministic_across_partitionings(spark, toy_edges) -> None:
    a = sorted(pagerank(toy_edges, "src", "dst").collect())
    b = sorted(pagerank(toy_edges.repartition(7), "src", "dst").collect())
    assert a == b


def test_pagerank_mass_bounded(spark, toy_edges) -> None:
    """Integer truncation only ever LOSES mass: total rank <= n * SCALE."""
    total = (
        pagerank(toy_edges, "src", "dst").agg(F.sum("rank").alias("s")).collect()[0]["s"]
    )
    assert 0 < total <= 3 * PAGERANK_SCALE


# ---------------------------------------------------------------------------
# Linear quality classifier
# ---------------------------------------------------------------------------


def test_linear_scores_consistent(spark, sf_dir) -> None:
    docs = table(spark, sf_dir, "documents")
    out = linear_quality_scores(docs, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["ttr_m"] <= 1000
        assert 0 <= r["len_m"] <= 1000
        assert 0 <= r["stop_m"] <= 1000
        assert r["keep"] == (r["z_score"] > 0)


# ---------------------------------------------------------------------------
# Compaction bins
# ---------------------------------------------------------------------------


def test_compaction_bins_invariants(spark) -> None:
    target = 1000
    files = spark.createDataFrame(
        [("p1", i, 300) for i in range(10)] + [("p2", 1, 5000), ("p2", 2, 10)],
        ["part", "f", "b"],
    )
    out = compaction_bins(files, "part", "f", "b", target_bytes=target).collect()
    by_part: dict = {}
    for r in out:
        by_part.setdefault(r["part_id"], []).append(r)
    # p1: 10 x 300 bytes -> offsets 0..2700; bin = offset // 1000:
    # files 0-3 (offsets 0,300,600,900) -> bin 0, 4-6 -> bin 1, ...
    p1 = sorted(by_part["p1"], key=lambda r: r["file"])
    assert [r["bin_id"] for r in p1] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    # bin_files counts agree with the actual bin membership
    from collections import Counter

    c = Counter((r["part_id"], r["bin_id"]) for r in out)
    assert all(c[(r["part_id"], r["bin_id"])] == r["bin_files"] for r in out)
    # an oversize file occupies its own bin; the next file starts a new one
    p2 = {r["file"]: r["bin_id"] for r in by_part["p2"]}
    assert p2[1] == 0 and p2[2] == 5


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------


def test_mmr_trades_relevance_for_diversity(spark) -> None:
    """Query = e1 axis. Candidates: two near-duplicates of the query
    (ids 1, 2), one orthogonal vector (id 3). Pure relevance ranks
    {1, 2} first, but MMR must pick the orthogonal 3 at step 2: after
    selecting 1, candidate 2's max_sim wipes out its relevance while
    3's is 0."""
    from protarrow_spark.operators.similarity import mmr_select_int8

    rows = [
        (0, [1.0, 0.0, 0.0]),   # the query vector
        (1, [1.0, 0.1, 0.0]),   # near-dup pair: more similar to each
        (2, [1.0, 0.12, 0.0]),  # other than to the query (mmr2 < 0)
        (3, [0.0, 0.0, 1.0]),   # orthogonal (mmr2 = 0)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["sel_order"]: r
        for r in mmr_select_int8(df, k=3, query_id=0).collect()
    }
    assert got[1]["vec_id"] == 1 and got[1]["max_sim"] == 0
    assert got[2]["vec_id"] == 3  # diversity beats the near-duplicate
    assert got[3]["vec_id"] == 2
    # per-step invariant: mmr2 = rel - max_sim, exact integers
    assert all(r["mmr2"] == r["rel"] - r["max_sim"] for r in got.values())


def test_mmr_matches_bruteforce_greedy(spark) -> None:
    """mmr_select_int8 vs a numpy re-implementation of the identical
    greedy on deterministic pseudo-random vectors — pins quantization,
    tie-breaks, and the max-over-selected fold beyond the tiny
    fixture."""
    import hashlib

    import numpy as np

    def vec(i):
        h = hashlib.md5(f"v|{i}".encode()).digest()
        return [(b - 128) / 64.0 for b in h[:6]]

    n, k, qid = 25, 6, 0
    rows = [(i, vec(i)) for i in range(n)]
    # reference: same quantization + greedy
    Q = {}
    for i, v in rows:
        a = np.array(v)
        s = max(np.abs(a).max(), 0.0) or 1.0
        Q[i] = np.floor(a / s * 127 + 0.5).astype(np.int64)
    rel = {i: int(Q[i] @ Q[qid]) for i in range(n) if i != qid}
    sel, expect = [], []
    for t in range(1, k + 1):
        best = None
        for i in sorted(rel):
            if i in sel:
                continue
            ms = max((int(Q[i] @ Q[j]) for j in sel), default=0)
            score = rel[i] - ms
            if best is None or score > best[0]:
                best = (score, i, ms)
        sel.append(best[1])
        expect.append((t, best[1], rel[best[1]], best[2], best[0]))

    from protarrow_spark.operators.similarity import mmr_select_int8

    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = [
        (r["sel_order"], r["vec_id"], r["rel"], r["max_sim"], r["mmr2"])
        for r in sorted(
            mmr_select_int8(df, k=k, query_id=qid).collect(),
            key=lambda r: r["sel_order"],
        )
    ]
    assert got == expect


def test_bpe_train_learns_expected_rules(spark) -> None:
    from protarrow_spark.operators.text import bpe_train_merges

    # 'ab' dominates: 3x in 'abab' words + 2x 'abc' = 8 occurrences.
    docs = spark.createDataFrame(
        [
            (1, "abab abab abc"),
            (2, "abab abc cc"),
        ],
        ["doc_id", "text"],
    )
    rules = {r["step"]: r for r in bpe_train_merges(docs, "doc_id", "text").collect()}
    assert rules[1]["pair"] == "a b" and rules[1]["merged"] == "ab"
    # 3 'abab' words contribute 2 'a b' pairs each + 2x 'abc' = 8.
    assert rules[1]["pair_count"] == 8
    # step 2: vocabulary is now {'ab ab', 'ab c', 'c c'}; 'ab ab' (x3)
    # beats 'ab c' (x2) and 'c c' (x1).
    assert rules[2]["pair"] == "ab ab" and rules[2]["merged"] == "abab"
    assert rules[2]["pair_count"] == 3
    # step 3: remaining pairs: 'ab c' x2, 'c c' x1.
    assert rules[3]["pair"] == "ab c" and rules[3]["pair_count"] == 2


def test_bpe_vocab_map_encodes_words(spark) -> None:
    """with_vocab_map=True returns the word -> final-symbol dimension:
    after the 3 merges above ('a b'->'ab', 'ab ab'->'abab',
    'ab c'->'abc'), 'abab'->1 token, 'abc'->1, 'cc'->'c c' stays 2."""
    from protarrow_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "abab abab abc"), (2, "abab abc cc")], ["doc_id", "text"]
    )
    merges, vmap = bpe_train_merges(docs, "doc_id", "text", with_vocab_map=True)
    assert merges.count() == 3
    got = {r["w"]: r["sym"] for r in vmap.collect()}
    assert got == {"abab": "abab", "abc": "abc", "cc": "c c"}


def test_bpe_train_deterministic_across_partitionings(spark) -> None:
    from protarrow_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(20)],
        ["doc_id", "text"],
    )
    a = sorted(bpe_train_merges(docs, "doc_id", "text").collect())
    b = sorted(bpe_train_merges(docs.repartition(7), "doc_id", "text").collect())
    assert a == b


def test_bpe_greedy_merge_on_runs(spark) -> None:
    """The rewrite is textbook greedy: 'aaaa' -> 'aa aa', 'aaa' -> 'aa a'
    (NOT the delimiter-sharing replace() approximation)."""
    from protarrow_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa aaa")], ["doc_id", "text"])
    rules = {r["step"]: r for r in bpe_train_merges(docs, "doc_id", "text").collect()}
    # step1: 'a a' pairs: aaaa has 3 (overlapping), aaa has 2 -> 2*3+2 = 8
    assert rules[1]["pair"] == "a a" and rules[1]["pair_count"] == 8
    # greedy rewrite: aaaa -> 'aa aa', aaa -> 'aa a'
    # step2 pairs: 'aa aa' x2, 'aa a' x1 -> top 'aa aa'
    assert rules[2]["pair"] == "aa aa" and rules[2]["pair_count"] == 2
