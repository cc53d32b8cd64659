"""Connected-components operator: convergence and cluster semantics."""

from __future__ import annotations

from protarrow_spark.operators.graph import connected_components, dedup_clusters


def test_cc_chain_and_components(spark):
    """A 40-node chain (worst case for plain label propagation — needs
    pointer jumping to converge in the iteration budget), a separate
    triangle, and an isolated pair."""
    chain = [(i, i + 1) for i in range(40)]
    tri = [(100, 101), (101, 102), (100, 102)]
    pair = [(200, 201)]
    edges = spark.createDataFrame(chain + tri + pair, "a long, b long")
    comp = {r["node"]: r["component"] for r in connected_components(edges, "a", "b").collect()}
    assert all(comp[i] == 0 for i in range(41))
    assert comp[100] == comp[101] == comp[102] == 100
    assert comp[200] == comp[201] == 200


def test_triangle_counts_known_graph(spark):
    """K4 on {0..3} (4 triangles, 3 per node), one pendant node 4, and
    a disjoint triangle-free path 10-11-12; duplicate/reversed edges
    and a self-loop must not change counts."""
    from protarrow_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = (
        k4
        + [(b, a) for a, b in k4]  # reversed duplicates
        + [(3, 4), (10, 11), (11, 12), (7, 7)]  # pendant, path, self-loop
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["degree"], r["triangles"]) for r in triangle_counts(df, "src", "dst").collect()}
    assert got == {
        0: (3, 3), 1: (3, 3), 2: (3, 3), 3: (4, 3), 4: (1, 0),
        10: (1, 0), 11: (2, 0), 12: (1, 0),
    }


def test_triangle_counts_match_bruteforce_random_graph(spark):
    """Degree-ordered node-iterator vs an O(n^3) adjacency-matrix
    reference on a seeded random graph — exercises orientation ties,
    hubs, and isolated-from-triangle nodes beyond the fixed fixture."""
    import hashlib

    import numpy as np

    from protarrow_spark.operators.graph import triangle_counts

    n = 40
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        # deterministic ~30% density via md5 (no RNG in tests)
        if int(hashlib.md5(f"e|{a}|{b}".encode()).hexdigest()[:4], 16) % 10 < 3
    ]
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        A[a, b] = A[b, a] = 1
    tri_per_node = np.diag(A @ A @ A) // 2  # walks of length 3 back to self
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df, "src", "dst").collect()}
    for node, t in got.items():
        assert t == tri_per_node[node], node
    # nodes absent from the edge list simply don't appear
    assert set(got) == {a for e in edges for a in e}


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(1, 3), (3, 5)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, edges, "doc_id").collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1}


def test_kcore_peels_tail_keeps_clique(spark):
    """4-clique + pendant path: the 3-core is exactly the clique (every
    clique node has in-core degree 3); the path peels away. Verified
    by hand, not by the oracle machinery."""
    import pyspark.sql.functions as F  # noqa: F401

    from protarrow_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + path, "src long, dst long")
    rows = kcore_peel(edges, k=3, rounds=4).collect()
    assert sorted(r.node for r in rows) == [0, 1, 2, 3]
    assert all(r.core_degree == 3 for r in rows)
    assert all(r.n_core_nodes == 4 for r in rows)
    assert all(r.converged for r in rows)


def test_kcore_early_exit_matches_exact_rounds(spark):
    """r14: the peel breaks at the fixed point (a round that removes
    nothing). Requesting far more rounds than convergence needs must
    return the IDENTICAL frame — node set, core degrees, survivor
    count, and converged flag — as the exact round count, because the
    unexecuted rounds would only re-tally the fixed-point value."""
    from protarrow_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + path, "src long, dst long")
    exact = sorted(map(tuple, kcore_peel(edges, k=3, rounds=2).collect()))
    padded = sorted(map(tuple, kcore_peel(edges, k=3, rounds=50).collect()))
    assert exact == padded and exact
    # k high enough to peel EVERYTHING: the loop must terminate on the
    # empty fixed point and return an empty core, not error.
    assert kcore_peel(edges, k=5, rounds=50).collect() == []


def test_kcore_unconverged_flag(spark):
    """A long path peels one layer per round from each end; with k=2
    and only 1 round, the flag must report non-convergence."""
    from protarrow_spark.operators.graph import kcore_peel

    path = [(i, i + 1) for i in range(8)]
    edges = spark.createDataFrame(path, "src long, dst long")
    rows = kcore_peel(edges, k=2, rounds=1).collect()
    assert rows and all(not r.converged for r in rows)
