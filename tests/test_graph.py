"""connected_components: exactness vs a brute-force reference, and
invariance to partitioning / contraction depth."""

from __future__ import annotations

import random

from pulsar_sync_java_spark.operators.graph import connected_components


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference labeling: BFS over adjacency, label = component min."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label: dict[int, int] = {}
    for start in adj:
        if start in label:
            continue
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in seen:
                        seen.add(m)
                        nxt.append(m)
            frontier = nxt
        lo = min(seen)
        for n in seen:
            label[n] = lo
    return label


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    got = connected_components(df, **kw).collect()
    return {r["id"]: r["label"] for r in got}


def test_cc_matches_bruteforce_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(6):
        n_nodes = rng.randrange(2, 120)
        n_edges = rng.randrange(1, 260)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        assert _run(spark, edges) == _brute_components(edges), f"trial {trial}"


def test_cc_chain_and_clique_and_self_loop(spark):
    # a path (worst case for label propagation), a clique, a self-loop
    chain = [(i, i + 1) for i in range(40)]
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges = chain + clique + [(999, 999)]
    got = _run(spark, edges)
    assert all(got[i] == 0 for i in range(41))
    assert all(got[100 + i] == 100 for i in range(5))
    assert got[999] == 999


def test_cc_invariant_to_contraction_depth(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    expect = _brute_components(edges)
    # force multi-round contraction with a deep ladder, and none at all
    assert _run(spark, edges, ladder=(16, 7, 3, 2)) == expect
    assert _run(spark, edges, ladder=()) == expect


def test_cc_empty(spark):
    assert _run(spark, []) == {}
