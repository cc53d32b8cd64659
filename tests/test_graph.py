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


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(1, 3), (3, 5)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, edges, "doc_id").collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1}
