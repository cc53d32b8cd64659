"""Property tests for sketch / probing / IVF operators — beyond the
oracle-parity gate (which pins implementation exactness), these pin
the *statistical contracts*: estimator accuracy, upper-bound
guarantees, and exact-recall-by-pigeonhole.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from protarrow_spark.operators import dedup, similarity, sketches
from protarrow_spark.sources.tables import table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_kmv_estimate_accuracy(spark, events):
    """KMV(k=64) relative error should be well inside 3/sqrt(k) ~ 38%
    for every group (synthetic data; bound holds with huge margin)."""
    est = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.kmv_distinct(events, "event_type", "user_id").collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(true)
    for g, t in true.items():
        rel = abs(est[g] - t) / t
        assert rel < 0.38, (g, est[g], t)


def test_kmv_small_group_exact(spark):
    """Groups with < k distinct values report the exact count."""
    df = spark.createDataFrame([("g", i % 7) for i in range(100)], "grp string, v int")
    [row] = sketches.kmv_distinct(df, "grp", "v", k=64).collect()
    assert row["est_distinct"] == 7.0


def test_cms_upper_bound(spark, events):
    """CMS estimates are never below the true count (min over d
    counting rows can only over-count via collisions)."""
    n_keys = events.select("user_id").distinct().count()
    rows = sketches.cms_heavy_hitters(events, "user_id").collect()
    assert len(rows) == min(20, n_keys)
    assert all(r["est_count"] >= r["true_count"] for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_simhash_hamming_exact_recall(spark, sf_dir):
    """Banded chunk probing finds EVERY pair within hamming <= 3
    (pigeonhole over 4 chunks) — compare against brute force on the
    signature table."""
    docs = table(spark, sf_dir, "documents").limit(200)
    sigs = dedup.simhash(docs, "doc_id", "text")
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    expected = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in brute.collect()}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_hamming_pairs(docs, "doc_id", "text").collect()
    }
    assert got == expected


def test_ivf_structure_and_recall(spark, sf_dir):
    """IVF returns exactly k ranked rows per query; probing 2/8 cells
    keeps useful recall vs brute force on the synthetic corpus."""
    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    ivf = similarity.cosine_topk_ivf(emb, qs, k=3).collect()
    per_q: dict = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())

    brute = similarity.cosine_topk_bruteforce(emb, qs, k=3).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.2, recall


def test_bpe_tokens_nonzero(spark, sf_dir):
    from protarrow_spark.operators.text import bpe_token_stats

    docs = table(spark, sf_dir, "documents").limit(50)
    rows = bpe_token_stats(docs, "doc_id", "text").collect()
    assert all(r["n_bpe_tokens"] >= r["n_ws_tokens"] for r in rows)
    assert all(r["chars_per_token"] > 0 for r in rows)


def test_kmv_sketch_mergeability(spark, events):
    """merge(sketch(first half), sketch(second half)) must equal
    sketch(all) exactly — the distributed-partial-state property —
    and estimates derived from sketch state must equal kmv_distinct."""
    import pyspark.sql.functions as F

    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = sketches.kmv_merge(
        sketches.kmv_sketch(half_a, "event_type", "user_id"),
        sketches.kmv_sketch(half_b, "event_type", "user_id"),
        "event_type",
    )
    whole = sketches.kmv_sketch(events, "event_type", "user_id")
    m = {r["event_type"]: list(r["hs"]) for r in merged.collect()}
    w = {r["event_type"]: list(r["hs"]) for r in whole.collect()}
    assert m == w

    est_m = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.kmv_estimate(merged, "event_type").collect()
    }
    est_d = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.kmv_distinct(events, "event_type", "user_id").collect()
    }
    assert est_m == est_d


def test_kmeans_monotone_inertia_and_determinism(spark, sf_dir):
    """Lloyd's iterations never increase inertia; assignments are
    identical across re-runs (deterministic init + fixed rounds)."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    inertias = []
    for n_iter in (0, 1, 3):
        assign = similarity.kmeans_lloyd(emb, n_iter=n_iter)
        # recompute this run's final centroids for the inertia metric
        cents = similarity._centroid_matrix(emb, "vec_id", "embedding", 8)
        if n_iter == 0:
            final = cents
        else:
            # re-derive by rerunning the same deterministic loop
            final = None
        if final is None:
            # inertia vs assigned centroid mean: use per-cluster means
            import pandas as pd

            pdf = emb.select("vec_id", "embedding").toPandas().merge(
                assign.toPandas(), on="vec_id"
            )
            V = np.stack([np.asarray(x, float) for x in pdf["embedding"]])
            cl = pdf["cluster"].to_numpy()
            final = np.stack(
                [
                    V[cl == c].mean(axis=0) if (cl == c).any() else np.zeros(V.shape[1])
                    for c in range(8)
                ]
            )
            inertias.append(float(((V - final[cl]) ** 2).sum()))
        else:
            inertias.append(similarity.kmeans_inertia(emb, assign, final))
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-9, inertias

    a1 = sorted(map(tuple, similarity.kmeans_lloyd(emb, n_iter=2).collect()))
    a2 = sorted(map(tuple, similarity.kmeans_lloyd(emb, n_iter=2).collect()))
    assert a1 == a2


def test_histogram_quantile_within_one_bin(spark, events):
    """Histogram p50/p90 estimates are within one bin width of the
    exact discrete quantiles."""
    import pyspark.sql.functions as F

    import math

    est = {
        r["event_type"]: r
        for r in sketches.histogram_quantiles(events, "event_type", "value").collect()
    }
    pdf = events.select("event_type", "value").toPandas()
    for g, r in est.items():
        # Reference: the DISCRETE quantile (value at rank ceil(q*n)) —
        # the definition the sketch approximates. An interpolated
        # percentile can sit arbitrarily far away when adjacent order
        # statistics have a gap, so it is NOT a valid reference here.
        vals = sorted(pdf[pdf["event_type"] == g]["value"])
        n = len(vals)
        width = (vals[-1] - vals[0]) / sketches.HIST_BINS
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            exact = vals[math.ceil(q * n) - 1]
            assert exact - width <= r[col] <= exact + width, (g, col, r[col], exact)

def test_histogram_degenerate_group_returns_lo(spark):
    """A group whose values are all equal (hi == lo) must yield the
    value itself for every quantile, not NaN (0/0 guard on both
    engines)."""
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
    )
    got = {r["g"]: r for r in sketches.histogram_quantiles(df, "g", "v").collect()}
    assert got["a"]["q50"] == 5.0 and got["a"]["q90"] == 5.0
    import math

    assert not math.isnan(got["b"]["q50"])


def test_simhash_hamming_rejects_unguaranteed_radius(spark, sf_dir):
    """max_hamming beyond the pigeonhole bound (chunks - 1) must raise
    instead of silently returning incomplete candidates."""
    docs = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_hamming_pairs(docs, "doc_id", "text", max_hamming=4)


def test_bloom_no_false_negatives_and_bounded_size(spark, sf_dir):
    # every member key must survive the prefilter (Bloom filters have
    # no false negatives), and the filter table is capped at bits/32
    # rows no matter how many keys went in
    orders = table(spark, sf_dir, "orders").select("o_orderkey").limit(500)
    bloom = sketches.bloom_build(orders, "o_orderkey")
    assert bloom.count() <= sketches.BLOOM_BITS // sketches.BLOOM_WORD
    kept = sketches.bloom_prefilter(orders, bloom, "o_orderkey")
    assert kept.count() == orders.count()


def test_bloom_false_positive_rate_is_small(spark, sf_dir):
    # probe with keys disjoint from the member set: survivors are
    # false positives; at 65,536 bits / 4 hashes / ~1.5k member keys
    # the expected rate is < 1%, allow 3% slack for hash variance
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    members = orders.filter(F.col("o_orderkey") % 10 == 0)
    probes = orders.filter(F.col("o_orderkey") % 10 != 0)
    bloom = sketches.bloom_build(members, "o_orderkey")
    n_probe = probes.count()
    n_fp = sketches.bloom_prefilter(probes, bloom, "o_orderkey").count()
    assert n_fp / n_probe < 0.03, (n_fp, n_probe)


def test_bloom_union_merge_equals_filter_of_union(spark, sf_dir):
    # mergeability: bit_or of two filters over key sets A and B is
    # bit-identical to one filter built over A UNION B — the property
    # that lets incremental loads extend a persisted filter
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 == 1)
    fa, fb = sketches.bloom_build(a, "o_orderkey"), sketches.bloom_build(b, "o_orderkey")
    merged = (
        fa.unionByName(fb)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = sketches.bloom_build(a.unionByName(b), "o_orderkey")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
