"""k-core (operators/kcore.py): the peel fixpoint must equal an
independent driver-side reference on random graphs, handle the
degenerate shapes (chain, clique, empty core), and be
partitioning-invariant by construction."""

import random

import pytest

from knowledge_harvest_from_lms_spark.operators.kcore import k_core


def _ref_kcore(edges, k):
    """Driver reference: literal peel loop over Python sets."""
    adj = {}
    for u, v in edges:
        u, v = str(u), str(v)
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < k:
                for v in adj.pop(u):
                    adj[v].discard(u)
                changed = True
    return {u: len(vs) for u, vs in adj.items()}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize("k,seed", [(2, 3), (3, 7), (4, 11)])
def test_matches_reference_random_graph(spark, k, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randint(0, 60), rng.randint(0, 60)) for _ in range(250)
    ]
    got = {
        r["vertex"]: r["core_degree"]
        for r in k_core(_df(spark, edges), k).collect()
    }
    assert got == _ref_kcore(edges, k)


def test_clique_plus_chain(spark):
    # 5-clique (3-core) with a pendant chain that must peel entirely
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    got = {
        r["vertex"]: r["core_degree"]
        for r in k_core(_df(spark, clique + chain), 3).collect()
    }
    assert got == {str(i): 4 for i in range(5)}


def test_cascade_peel(spark):
    # chain: every vertex peels at k=2, but only via cascading rounds
    chain = [(i, i + 1) for i in range(12)]
    assert k_core(_df(spark, chain), 2).count() == 0
    # cycle: 2-core is the whole cycle
    cycle = chain + [(12, 0)]
    got = {
        r["vertex"]: r["core_degree"]
        for r in k_core(_df(spark, cycle), 2).collect()
    }
    assert got == {str(i): 2 for i in range(13)}


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (3, 1)]
    got = {
        r["vertex"]: r["core_degree"]
        for r in k_core(_df(spark, edges), 2).collect()
    }
    assert got == {"1": 2, "2": 2, "3": 2}


def test_k1_keeps_all_non_isolated(spark):
    got = k_core(_df(spark, [(1, 2), (3, 4)]), 1).count()
    assert got == 4
    with pytest.raises(ValueError, match="k must be"):
        k_core(_df(spark, [(1, 2)]), 0)
