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


def test_minhash_pairs_sound_and_exact_complete_via_duckdb(spark):
    """DuckDB soundness oracle for the q93 minhash pairs (VERDICT r2
    item 3's q93 half, test-level since banding completeness is
    probabilistic): every reported pair's TRUE padded-3-gram jaccard
    over 512-char prefixes must clear the threshold (soundness), and
    every jaccard = 1.0 pair must be reported (exact-dup completeness
    is guaranteed — identical gram sets share every band, and
    identical prefixes pair through the star edges)."""
    import duckdb

    from knowledge_harvest_from_lms_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    reported = minhash_near_dup_pairs(
        docs, "text", "doc_id", sim_threshold=0.8
    ).collect()
    assert reported, "synthetic docs are templated; pairs expected"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    con.execute("""
        CREATE VIEW grams AS
        SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(
                 RANGE(1, GREATEST(LENGTH(p) - 2, 1) + 1),
                 i -> SUBSTR(p, i, 3))) AS g
        FROM (SELECT doc_id, ' ' || SUBSTR(text, 1, 512) || ' ' AS p
              FROM documents)
    """)
    true_jac = {
        (a, b): j
        for a, b, j in con.execute("""
            SELECT x.doc_id, y.doc_id,
                   CAST(LEN(LIST_INTERSECT(x.g, y.g)) AS DOUBLE)
                   / LEN(LIST_DISTINCT(LIST_CONCAT(x.g, y.g)))
            FROM grams x JOIN grams y ON x.doc_id < y.doc_id
        """).fetchall()
    }
    for r in reported:
        assert true_jac[(r.id_a, r.id_b)] >= 0.8 - 1e-9, (
            r.id_a, r.id_b, true_jac[(r.id_a, r.id_b)], r.jaccard)
    got = {(r.id_a, r.id_b) for r in reported}
    exact = {k for k, j in true_jac.items() if j >= 1.0 - 1e-12}
    assert exact, "expected at least one exact-gram-set pair at sf0.001"
    assert exact <= got, exact - got


def test_paragraph_dedup_across_docs(spark):
    """Cross-doc paragraph dedup: first occurrence by (id, pos) wins,
    texts reassemble in order, empty docs survive as rows."""
    from pyspark.sql import Row

    from knowledge_harvest_from_lms_spark.operators.dedup import (
        dedup_paragraphs_across_docs,
    )

    boiler = "subscribe to the newsletter"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha one\n\n{boiler}\n\nalpha two"),
            Row(doc_id=2, text=f"{boiler}\n\nbeta body"),
            Row(doc_id=3, text=boiler),          # loses its only para
            Row(doc_id=4, text=None),            # NULL text
        ]
    )
    out = {r.doc_id: r for r in dedup_paragraphs_across_docs(df).collect()}
    assert out[1].text == f"alpha one\n\n{boiler}\n\nalpha two"
    assert out[1].n_paras_kept == 3
    assert out[2].text == "beta body"            # boiler cut, order kept
    assert out[2].n_paras_kept == 1
    assert out[3].text == "" and out[3].n_paras_kept == 0
    assert out[4].text == "" and out[4].n_paras_kept == 0  # row preserved


def test_paragraph_dedup_min_chars_keeps_short(spark):
    """Paragraphs below min_para_chars are kept VERBATIM everywhere —
    never used as dedup keys (cutting every 'Yes.' corpus-wide is not
    the intent)."""
    from pyspark.sql import Row

    from knowledge_harvest_from_lms_spark.operators.dedup import (
        dedup_paragraphs_across_docs,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Yes.\n\nlong paragraph body here"),
            Row(doc_id=2, text="Yes.\n\nother body"),
        ]
    )
    out = {
        r.doc_id: r
        for r in dedup_paragraphs_across_docs(df, min_para_chars=10).collect()
    }
    assert out[1].text.startswith("Yes.")
    assert out[2].text.startswith("Yes.")  # short para kept in BOTH


def test_paragraph_dedup_skew_safe_plan(spark):
    """The winner per paragraph is a partial-agg min, not a window
    over the paragraph key — no Window node in the plan (a hot
    boilerplate paragraph must collapse map-side)."""
    from pyspark.sql import Row

    from knowledge_harvest_from_lms_spark.operators.dedup import (
        dedup_paragraphs_across_docs,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="a\n\nb")])
    plan = (
        dedup_paragraphs_across_docs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
