"""Property tests for the dedup keep/drop cluster machinery
(VERDICT r2 item 8): random dup graphs — chains, stars, cliques, mixed
components over non-contiguous ids — must always collapse to one
min-id keeper per connected component with no convergence warning;
an adversarial long chain under a starved iteration budget must WARN
rather than silently split a component."""

import warnings

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knowledge_harvest_from_lms_spark.operators.dedup import cluster_decisions


def _components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@st.composite
def dup_graphs(draw):
    """(n_nodes, ids, edges): up to 6 components of shape chain / star
    / clique (diameter kept small — pointer doubling covers chains far
    longer than real near-dup clusters within its default budget),
    over sparse non-contiguous ids."""
    n_comps = draw(st.integers(1, 6))
    sizes = [draw(st.integers(1, 18)) for _ in range(n_comps)]
    n_nodes = sum(sizes)
    # non-contiguous, shuffled external ids
    gaps = draw(
        st.lists(st.integers(1, 50), min_size=n_nodes, max_size=n_nodes)
    )
    ids = []
    acc = 0
    for g in gaps:
        acc += g
        ids.append(acc)
    perm = draw(st.permutations(range(n_nodes)))
    ids = [ids[p] for p in perm]

    edges = []
    base = 0
    for size in sizes:
        nodes = list(range(base, base + size))
        shape = draw(st.sampled_from(["chain", "star", "clique"]))
        if size > 1:
            if shape == "chain":
                edges += list(zip(nodes, nodes[1:]))
            elif shape == "star":
                hub = draw(st.sampled_from(nodes))
                edges += [(hub, x) for x in nodes if x != hub]
            else:
                edges += [
                    (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]
                ][: 4 * size]
        base += size
    return n_nodes, ids, edges


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=dup_graphs())
def test_one_min_keeper_per_component(spark, g):
    n_nodes, ids, edges = g
    expected = _components(n_nodes, edges)

    docs = spark.createDataFrame([(ids[i],) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(
        [(ids[a], ids[b]) for a, b in edges] or [(ids[0], ids[0])],
        "id_a long, id_b long",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no convergence warning
        rows = cluster_decisions(docs, pairs, "doc_id").collect()

    got = {r.doc_id: (r.canonical_id, r.is_duplicate) for r in rows}
    assert len(got) == n_nodes
    comp_min = {}
    for i in range(n_nodes):
        root = expected[i]
        comp_min.setdefault(root, min(
            ids[j] for j in range(n_nodes) if expected[j] == root
        ))
    for i in range(n_nodes):
        want_canon = comp_min[expected[i]]
        assert got[ids[i]] == (want_canon, ids[i] != want_canon), (ids[i], got[ids[i]])
    # exactly one keeper per component
    keepers = [d for d, (c, dup) in got.items() if not dup]
    assert sorted(keepers) == sorted(set(comp_min.values()))


def test_adversarial_chain_warns_not_splits_silently(spark):
    """A 200-node chain cannot converge in 2 pointer-doubling
    iterations: the engine must WARN (ADVICE r1 contract) instead of
    silently emitting a split component."""
    from knowledge_harvest_from_lms_spark.operators.graph import canonical_map

    n = 200
    ents = spark.createDataFrame([(f"{i:020d}",) for i in range(n)], "ent string")
    pairs = spark.createDataFrame(
        [(f"{i:020d}", f"{i + 1:020d}") for i in range(n - 1)],
        "ent_a string, ent_b string",
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        canonical_map(ents, pairs, max_iters=2).collect()
