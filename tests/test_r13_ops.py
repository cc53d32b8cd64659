"""Round-13 operator tests.

* kNN label-audit hot-bucket split: a bucket over ``max_bucket_rows``
  now runs as block-pair tasks + a window merge instead of raising
  (the r12 fail-stop). The split must be INVISIBLE: identical report
  to the one-task kernel on a raised bound, bit-for-bit, including
  cosine ties from exact duplicate vectors (the duplicate-heavy
  corpus is exactly the case that floods one sign bucket at scale).
"""

from __future__ import annotations

import pytest


def _knn_frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )


def _skewed_rows(n: int = 60) -> list:
    """One sign bucket (all-positive first component), duplicate-heavy:
    every third vector is an EXACT copy of vector 0 (cosine ties that
    must break toward the smaller neighbor id), labels alternate so
    agreement counts are informative."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            v = [1.0, 0.5, 0.25]
        else:
            v = [1.0, 0.1 * (i % 7), 0.01 * i]
        rows.append((i, v, i % 3))
    return rows


def _canon(df) -> list:
    return sorted(
        (
            r["vec_id"],
            r["label"],
            r["n_nbrs"],
            r["n_same_label"],
            r["agree_millis"],
            r["suspect"],
        )
        for r in df.collect()
    )


@pytest.mark.parametrize("max_bucket_rows", [8, 16, 59])
def test_knn_hot_bucket_split_matches_unsplit_kernel(spark, max_bucket_rows):
    from protarrow_spark.operators.similarity import knn_label_consistency

    frame = _knn_frame(spark, _skewed_rows(60))
    # n_components=0 -> a single bucket of 60 rows: over every tested
    # bound, so the block-pair path handles the whole corpus.
    split = knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=max_bucket_rows
    )
    unsplit = knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=10_000
    )
    got, want = _canon(split), _canon(unsplit)
    assert len(want) == 60
    assert got == want


def test_knn_split_handles_bucket_mix(spark):
    """Small buckets keep the one-task kernel while a hot sibling
    bucket splits — the union must cover every auditable vector
    exactly once."""
    from protarrow_spark.operators.similarity import knn_label_consistency

    rows = _skewed_rows(40)
    # a second bucket: negative first component flips the first sign
    rows += [
        (100 + i, [-1.0, 0.2 * i, 0.1], i % 2) for i in range(6)
    ]
    frame = _knn_frame(spark, rows)
    split = knn_label_consistency(
        frame, k=3, n_components=1, max_bucket_rows=10
    )
    unsplit = knn_label_consistency(
        frame, k=3, n_components=1, max_bucket_rows=10_000
    )
    got, want = _canon(split), _canon(unsplit)
    assert len(want) == 46
    assert got == want


def test_knn_split_exact_under_census_overcount(spark):
    """The routing census deliberately skips the zero-norm predicate
    (an upper bound); zero-norm and unlabeled rows must still be
    excluded from the report and must not perturb n_nbrs (which the
    merge derives from the actual candidate count, not the census)."""
    from protarrow_spark.operators.similarity import knn_label_consistency

    rows = _skewed_rows(20)
    rows += [(200 + i, [0.0, 0.0, 0.0], 1) for i in range(30)]  # zero-norm
    rows += [(300 + i, [1.0, 0.2, 0.3], None) for i in range(10)]  # unlabeled
    frame = _knn_frame(spark, rows)
    # census sees 60 rows in the single bucket -> hot at bound 25,
    # but only 20 auditable rows actually flow through the split.
    split = knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=25
    )
    unsplit = knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=10_000
    )
    got, want = _canon(split), _canon(unsplit)
    assert len(want) == 20
    assert got == want


def test_knn_in_task_blocked_fallback_matches(spark, monkeypatch):
    """A stale routing census (memoized statistics after the data
    changed under the same plan) can send an over-bound bucket to the
    one-task kernel; the kernel's in-task blocked sweep must then
    reproduce the full-Gram report exactly instead of fail-stopping."""
    from protarrow_spark.operators import similarity

    class _StaleCensus(dict):
        def get(self, key, default=None):  # pretend: no hot buckets
            return {}

    frame = _knn_frame(spark, _skewed_rows(60))
    monkeypatch.setattr(similarity, "_CENSUS_MEMO", _StaleCensus())
    fallback = similarity.knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=8
    )
    monkeypatch.setattr(similarity, "_CENSUS_MEMO", {})
    unsplit = similarity.knn_label_consistency(
        frame, k=5, n_components=0, max_bucket_rows=10_000
    )
    got, want = _canon(fallback), _canon(unsplit)
    assert len(want) == 60
    assert got == want


def test_mmr_large_k_anti_join_matches_literal_path(spark):
    """mmr_select_int8(large_k=True) swaps the per-step ~isin literal
    for a broadcast LEFT ANTI join; at k=20 both paths must produce
    the identical selection, and the exclusion frame's plan must show
    the anti-join (no isin literal growth)."""
    import numpy as np

    from protarrow_spark.operators.similarity import (
        _mmr_excluded,
        mmr_select_int8,
    )

    rng = np.random.default_rng(13)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)])
        for i in range(64)
    ]
    frame = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit = mmr_select_int8(frame, k=20, query_id=0).collect()
    anti = mmr_select_int8(frame, k=20, query_id=0, large_k=True).collect()
    assert len(lit) == 20
    assert [tuple(r) for r in lit] == [tuple(r) for r in anti]

    cand = frame.select("vec_id")
    plan_anti = _mmr_excluded(cand, "vec_id", [1, 2, 3], True)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan_anti
    assert "INSET" not in plan_anti and " IN (" not in plan_anti
    plan_lit = _mmr_excluded(cand, "vec_id", [1, 2, 3], False)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan_lit


class TestRetrievalEvalNdcg:
    def test_hand_computed_metrics(self, spark, tmp_path):
        """2-D corpus at distinct angles from the query vector, so the
        cosine ranking of query 0's neighbors is exactly the id order:
        relevant (same-label) docs planted at ranks 2 and 5 give a
        hand-computable DCG/IDCG/recall/MRR in the query's fixed-point
        arithmetic."""
        import math

        from protarrow_spark.queries.pipeline import (
            NDCG_PPM,
            _ndcg_discounts,
            retrieval_eval_ndcg,
        )

        rows = [(0, [1.0, 0.0], 0)]
        for i in range(1, 13):
            a = math.radians(5.0 * i)
            rows.append((i, [math.cos(a), math.sin(a)], 0 if i in (2, 5) else 1))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v], lbl) for i, v, lbl in rows],
            "vec_id long, embedding array<float>, label int",
        )
        df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

        out = {
            r["query_id"]: r
            for r in retrieval_eval_ndcg(spark, str(tmp_path)).collect()
        }
        disc = _ndcg_discounts()
        r0 = out[0]
        assert r0["relevant_total"] == 2
        assert r0["relevant_found"] == 2
        assert r0["first_rel_rank"] == 2
        assert r0["dcg_fp"] == disc[1] + disc[4]  # ranks 2 and 5
        assert r0["idcg_fp"] == disc[0] + disc[1]  # ideal: ranks 1 and 2
        assert r0["ndcg_ppm"] == (r0["dcg_fp"] * NDCG_PPM) // r0["idcg_fp"]
        assert r0["recall_ppm"] == NDCG_PPM  # found both of min(2, k)
        assert r0["rr_ppm"] == NDCG_PPM // 2
        # every labeled vec_id < 16 is a query; all rows carry sane ratios
        assert len(out) == 13
        assert all(0 <= r["ndcg_ppm"] <= NDCG_PPM for r in out.values())
        assert all(0 <= r["recall_ppm"] <= NDCG_PPM for r in out.values())


class TestKcenterCoreset:
    def test_hand_computed_greedy_walk(self, spark, tmp_path):
        """1-D corpus on a line: the greedy farthest-point walk is
        hand-traceable. Points at 0, 1, 10, 100 (quantized scale per
        vector makes 1-D degenerate, so use 2-D with a fixed max
        component to pin the int8 grid)."""
        # 2-D: second component fixed at 127-scale anchor 1.0 so every
        # vector's int8 scale is 1.0 -> q = round(127 * x)
        pts = {0: 0.0, 1: 0.01, 2: 0.5, 3: 1.0, 4: 0.99}
        rows = [(i, [x, 1.0], 0) for i, x in pts.items()]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

        from protarrow_spark.queries.pipeline import sample_kcenter_coreset

        out = [
            (r["step"], r["vec_id"], r["d2_to_selected"])
            for r in sample_kcenter_coreset(spark, str(tmp_path)).collect()
        ]
        q = {i: round(127 * x) for i, x in pts.items()}
        d2 = lambda a, b: (q[a] - q[b]) ** 2
        # greedy from seed 0: farthest is 3 (127^2), then the point
        # maximizing min(d2 to 0, d2 to 3) -> 2 (63^2 ...), then 1 vs 4
        assert out[0] == (1, 0, 0)
        assert out[1] == (2, 3, d2(0, 3))
        assert out[2] == (3, 2, min(d2(2, 0), d2(2, 3)))
        exp4 = {i: min(d2(i, 0), d2(i, 3), d2(i, 2)) for i in (1, 4)}
        pick4 = max(sorted(exp4), key=lambda i: (exp4[i], -i))
        assert out[3] == (4, pick4, exp4[pick4])
        # corpus of 5 < k=8: the walk stops after 5 picks (no crash)
        assert len(out) == 5
        assert [s for s, _, _ in out] == [1, 2, 3, 4, 5]

    def test_driver_kernel_matches_distributed_rounds(self, spark):
        """The size-gated driver kernel and the distributed matmul
        rounds must emit the IDENTICAL greedy walk — duplicates
        (d2=0 ties) and all."""
        import numpy as np

        from protarrow_spark.operators.similarity import kcenter_greedy

        rng = np.random.default_rng(131)
        rows = [
            (int(i), [float(x) for x in rng.standard_normal(16)])
            for i in range(300)
        ]
        # duplicate-heavy tail: exact copies force d2=0 ties
        rows += [(300 + i, rows[i][1]) for i in range(20)]
        frame = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        drv = kcenter_greedy(frame, k=12)  # 320 <= gate -> driver kernel
        dist = kcenter_greedy(frame, k=12, max_driver_rows=0)
        assert drv == dist
        assert len(drv) == 12


class TestEpochShuffle:
    def test_reproducible_distinct_balanced(self, spark, tmp_path):
        rows = [(i, f"doc {i}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

        from protarrow_spark.queries.pipeline import (
            EPOCH_SHUFFLE_EPOCHS,
            EPOCH_SHUFFLE_SHARDS,
            order_epoch_shuffle,
        )

        a = order_epoch_shuffle(spark, str(tmp_path)).collect()
        b = order_epoch_shuffle(spark, str(tmp_path)).collect()
        # reproducible: re-running regenerates the identical order
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        by_epoch = {}
        for r in a:
            by_epoch.setdefault(r["epoch"], {})[r["position"]] = r["doc_id"]
        # every epoch is a full permutation, and epochs differ
        perms = [
            [by_epoch[e][p] for p in sorted(by_epoch[e])]
            for e in sorted(by_epoch)
        ]
        assert len(perms) == EPOCH_SHUFFLE_EPOCHS
        assert all(sorted(p) == list(range(40)) for p in perms)
        assert perms[0] != perms[1]
        # shards are contiguous position ranges of near-equal size
        for e in sorted(by_epoch):
            shards = {}
            for r in a:
                if r["epoch"] == e:
                    shards.setdefault(r["shard"], []).append(r["position"])
            assert len(shards) == EPOCH_SHUFFLE_SHARDS
            sizes = {len(v) for v in shards.values()}
            assert sizes == {40 // EPOCH_SHUFFLE_SHARDS}
            for s, ps in shards.items():
                assert max(ps) - min(ps) + 1 == len(ps)  # contiguous


class TestKsDrift:
    def test_hand_computed_ks(self, spark, tmp_path):
        """Two hand-built samples with a known ECDF gap: hi = {1,2,3},
        lo = {3,4,5,6} -> D = max|c_hi*n_lo - c_lo*n_hi| peaks after
        v=3: |3*4 - 1*3| = 9, ks = 9/12."""
        rows = [
            (1, 1.0, "1-URGENT"), (2, 2.0, "2-HIGH"), (3, 3.0, "1-URGENT"),
            (4, 3.0, "5-LOW"), (5, 4.0, "5-LOW"), (6, 5.0, "3-MEDIUM"),
            (7, 6.0, "4-NOT SPECIFIED"),
        ]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
        )
        df.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
        from protarrow_spark.queries.relational import dq_ks_drift

        r = dq_ks_drift(spark, str(tmp_path)).collect()[0]
        assert (r["n_hi"], r["n_lo"]) == (3, 4)
        assert r["ks_num"] == 9
        assert r["ks_value"] == 3.0
        assert r["ks_ppm"] == (9 * 10**6) // 12
