"""Connected-components correctness: alternating star rounds vs a
pure-Python union-find ground truth, across adversarial graph shapes
(chains force many propagation hops; stars and cliques force fan-in)."""

from __future__ import annotations

import random

import pytest

from chewdata_spark.operators.graph import cluster_dedup, connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label every node with its component min
    labels: dict[int, int] = {}
    comp_min: dict[int, int] = {}
    for n in parent:
        comp_min.setdefault(find(n), n)
        comp_min[find(n)] = min(comp_min[find(n)], n)
    for n in parent:
        labels[n] = comp_min[find(n)]
    return labels


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    assert got == set(_union_find(edges).items())


def test_nonconvergence_raises_not_silent(spark):
    # exhausting max_iter before edge-set stability must fail loudly:
    # silent under-merged labels corrupt downstream cluster dedup
    import pytest
    from chewdata_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "id_a", "id_b", max_iter=1)


def test_chain_long_diameter(spark):
    # a 40-node path: O(diameter) algorithms need 40 rounds, the
    # star algorithm must finish well inside max_iter=25
    _check(spark, [(i, i + 1) for i in range(40)])


def test_two_cliques_and_singleton_pair(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges += [(100, 101)]
    _check(spark, edges)


def test_star_and_reverse_star(spark):
    _check(spark, [(0, i) for i in range(1, 8)] + [(j, 50) for j in range(20, 25)])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(70)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    _check(spark, edges)


def test_cluster_dedup_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(10)], "doc_id long, text string"
    )
    # chain 0-1-2 is ONE cluster: greedy pairwise would keep only 0,
    # cluster dedup must also keep nothing else from {1,2} but keep
    # 3 (unpaired) and the min of {4,5}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in cluster_dedup(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4, 6, 7, 8, 9]


def test_large_random_graph_many_components(spark):
    # 300 nodes, sparse — dozens of small components plus a 60-node
    # chain grafted in (stress: many roots + long diameter at once)
    rng = random.Random(99)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(160)]
    edges += [(1000 + i, 1001 + i) for i in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    _check(spark, edges)


def test_already_star_converges_first_round(spark):
    """The r15 count-short-circuit convergence check: an input that is
    already a star (every edge node -> component min) must converge on
    the very first stability probe — the round where the new edge set
    equals the old one, i.e. the one path that actually runs the
    one-directional exceptAll behind the count gate."""
    edges = [(2, 1), (3, 1), (4, 1), (6, 5)]
    _check(spark, edges)
