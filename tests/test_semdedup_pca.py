"""Property tests for the round-6 embedding operators: SemDeDup's
greedy keep rule against a brute-force numpy reference, and the
fixed-point PC1 against numpy's float eigenvector."""

from __future__ import annotations

import numpy as np

from protarrow_spark.operators.similarity import (
    PCA_SCALE,
    SEMDEDUP_COS_DEN,
    SEMDEDUP_COS_NUM,
    pca_top1_int,
    quantize_int8,
    semdedup_int8,
)


def _random_frame(spark, n=60, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    # plant near-duplicates: rows 3i+1 are tiny perturbations of 3i
    for i in range(0, n - 1, 3):
        base[i + 1] = base[i] + rng.normal(scale=1e-3, size=dim).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_semdedup_matches_bruteforce_reference(spark):
    df, _ = _random_frame(spark)
    out = {r["vec_id"]: r for r in semdedup_int8(df, k=3, iterations=2).collect()}

    # Reference: replicate quantization via the operator itself (its
    # parity with SQL is pinned by the oracle gate), then brute-force
    # the greedy min-id-survivor rule per cluster in numpy.
    qrows = quantize_int8(df).collect()
    Q = {r["vec_id"]: np.asarray(r["q"], dtype=np.int64) for r in qrows}
    clusters: dict[int, list[int]] = {}
    for vid, r in out.items():
        clusters.setdefault(r["cluster"], []).append(vid)
    num2 = SEMDEDUP_COS_NUM**2
    den2 = SEMDEDUP_COS_DEN**2
    for members in clusters.values():
        members.sort()
        for j, b in enumerate(members):
            expect_removed = False
            for a in members[:j]:
                d = int(Q[a] @ Q[b])
                if d > 0 and den2 * d * d >= num2 * int(Q[a] @ Q[a]) * int(
                    Q[b] @ Q[b]
                ):
                    expect_removed = True
                    break
            assert out[b]["kept"] == (0 if expect_removed else 1), b


def test_semdedup_removes_planted_duplicates(spark):
    df, _ = _random_frame(spark)
    out = {r["vec_id"]: r for r in semdedup_int8(df, k=3, iterations=2).collect()}
    removed = {vid for vid, r in out.items() if r["kept"] == 0}
    # At least half the planted twins must be caught (a twin escapes
    # only if k-means separates the pair across cluster boundaries).
    planted = {i + 1 for i in range(0, 59, 3)}
    assert len(removed & planted) >= len(planted) // 2
    # A planted twin pair that lands in one cluster can never BOTH
    # survive (cos ~ 1 >> 2/5). (The greedy rule may remove the base
    # too, via a different smaller-id neighbor — that's by design.)
    for i in range(0, 59, 3):
        if out[i]["cluster"] == out[i + 1]["cluster"]:
            assert not (out[i]["kept"] == 1 and out[i + 1]["kept"] == 1), i


def test_pca_top1_aligns_with_numpy_eigenvector(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant axis along a fixed direction
    d = 8
    axis = rng.normal(size=d)
    axis /= np.linalg.norm(axis)
    pts = (
        rng.normal(size=(300, 1)) * axis[None, :] * 5.0
        + rng.normal(size=(300, d)) * 0.3
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )
    out = sorted(pca_top1_int(df).collect(), key=lambda r: r["pos"])
    v = np.array([r["loading"] for r in out], dtype=np.float64)
    assert len(v) == d and np.abs(v).max() == PCA_SCALE  # scale-normalized

    # float reference on the QUANTIZED data (what the operator sees)
    qrows = quantize_int8(df).collect()
    Q = np.stack([np.asarray(r["q"], dtype=np.float64) for r in qrows])
    C = np.cov(Q, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(C)
    ref = vecs[:, -1]
    cos = abs(ref @ v) / (np.linalg.norm(ref) * np.linalg.norm(v))
    assert cos > 0.99, cos


def test_pca_projection_orders_along_dominant_axis(spark):
    from protarrow_spark.operators.similarity import pca_project_int

    rng = np.random.default_rng(13)
    d = 8
    axis = np.zeros(d)
    axis[2] = 1.0
    coords = np.linspace(-5, 5, 50)
    pts = (coords[:, None] * axis[None, :] + rng.normal(size=(50, d)) * 0.05).astype(
        np.float32
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    proj = {r["vec_id"]: r["proj"] for r in pca_project_int(df).collect()}
    # Per-vector int8 scaling normalizes magnitude, so projections are
    # not monotone in the planted coordinate — but the SIGN along the
    # dominant axis must be consistent away from the origin.
    neg = [proj[i] for i in range(50) if coords[i] < -1]
    pos = [proj[i] for i in range(50) if coords[i] > 1]
    s = 1 if pos[0] > 0 else -1
    assert all(s * p > 0 for p in pos)
    assert all(s * p < 0 for p in neg)


def test_boilerplate_ngrams_handcrafted(spark):
    from protarrow_spark.operators.text import boilerplate_ngrams

    # pct=50 over a 3-doc source: boiler needs df >= 2, so "foo bar"
    # (in docs 0 and 1) is boilerplate and every df-1 gram is not.
    # (At the default 20% a 3-doc source flags EVERY gram — df*100 >=
    # 20*3 holds at df=1 — which is why the threshold is a parameter.)
    docs = spark.createDataFrame(
        [
            (0, "A", "foo bar baz one"),
            (1, "A", "foo bar two three"),
            (2, "A", "four five six seven"),
            (3, "B", "x"),            # shorter than a bigram
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngrams(docs, "doc_id", "text", "source", pct=50).collect()
    }
    # doc 0: grams = [foo bar, bar baz, baz one]; only "foo bar" has df 2/3
    assert out[0]["n_grams"] == 3 and out[0]["n_boiler_grams"] == 1
    assert out[0]["clean_ppm"] == (2 * 1_000_000) // 3
    assert out[1]["n_boiler_grams"] == 1
    # doc 2 shares nothing
    assert out[2]["n_boiler_grams"] == 0 and out[2]["clean_ppm"] == 1_000_000
    # single-token doc: zero grams, fully clean by convention
    assert out[3]["n_grams"] == 0 and out[3]["clean_ppm"] == 1_000_000
