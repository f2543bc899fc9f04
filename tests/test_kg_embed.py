"""TransE embedding training (operators/kg_embed.py): hash init and
the full-batch fixed-point subgradient step are replayed EXACTLY (==,
not approx) by an independent Python implementation — the bit-stable
training contract — plus learning-signal and plan-shape checks."""

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.kg_embed import (
    GRAD_SCALE,
    init_embeddings,
    transe_distance,
    transe_step,
)

M = 1_000_000_007
MIX = ((2246822519, 15), (2654435761, 13), (3266489917, 16))
PAIRS = "subj string, pred string, obj string, neg_obj string"


def phash(key: str, seed: int) -> int:
    """Python replica of sketches.kmv_hash(hasher='portable')."""
    h = 0
    for c in f"{key}#{seed}":
        h = (h * 31 + ord(c)) % M
    for a, s in MIX:
        h = (h * a) % M
        h ^= h >> s
    return (h * 97) % M


def pinit(ids, dim, seed=0, scale=None):
    s = float(scale) if scale is not None else 6.0 / dim**0.5
    return {
        i: [
            (phash(f"{i}|{k}", seed) / float(M)) * (2.0 * s) - s
            for k in range(dim)
        ]
        for i in ids
    }


def rhu(x: float) -> int:
    """round-half-up (away from zero) — Spark F.round on doubles."""
    return int(
        Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def pstep(emb, pairs, lr=0.01, margin=1.0):
    """Python replica of transe_step: same fold order, same
    quantization, same update expression."""
    grads: dict[str, list[int]] = {}

    def acc(i, qs):
        g = grads.setdefault(i, [0] * len(qs))
        for k, q in enumerate(qs):
            g[k] += q

    for s_, p_, o_, n_ in pairs:
        h, r, t, tn = emb[s_], emb[p_], emb[o_], emb[n_]
        dp = [(hi + ri) - ti for hi, ri, ti in zip(h, r, t)]
        dn = [(hi + ri) - ti for hi, ri, ti in zip(h, r, tn)]
        d_pos = 0.0
        for x in dp:
            d_pos = d_pos + x * x
        d_neg = 0.0
        for x in dn:
            d_neg = d_neg + x * x
        if not ((margin + d_pos) - d_neg > 0):
            continue
        g_hr = [rhu(2.0 * (a - b) * float(GRAD_SCALE)) for a, b in zip(dp, dn)]
        acc(s_, g_hr)
        acc(p_, g_hr)
        acc(o_, [-rhu(2.0 * x * float(GRAD_SCALE)) for x in dp])
        acc(n_, [rhu(2.0 * x * float(GRAD_SCALE)) for x in dn])
    out = {}
    for i, v in emb.items():
        if i in grads:
            out[i] = [
                vi - lr * (q / float(GRAD_SCALE))
                for vi, q in zip(v, grads[i])
            ]
        else:
            out[i] = list(v)
    return out


IDS = ["e:a", "e:b", "e:c", "e:d", "e:e", "p:rel"]
RAW_PAIRS = [
    ("e:a", "p:rel", "e:b", "e:c"),
    ("e:b", "p:rel", "e:c", "e:d"),
    ("e:c", "p:rel", "e:d", "e:e"),
    ("e:a", "p:rel", "e:d", "e:e"),
]


def _spark_emb(df):
    return {r.id: list(r.emb) for r in df.collect()}


def test_init_matches_python_replica_exactly(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "id string")
    got = _spark_emb(init_embeddings(ids, dim=4, seed=7))
    assert got == pinit(IDS, 4, seed=7)


def test_init_seed_and_dim_sensitivity(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "id string")
    a = _spark_emb(init_embeddings(ids, dim=4, seed=0))
    b = _spark_emb(init_embeddings(ids, dim=4, seed=1))
    assert a != b
    s = 6.0 / 2.0  # dim=4 -> scale 3.0
    assert all(-s <= v < s for vec in a.values() for v in vec)


def test_step_matches_python_replica_exactly(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "id string")
    emb0 = init_embeddings(ids, dim=4, seed=0)
    pairs = spark.createDataFrame(RAW_PAIRS, PAIRS)
    got1 = _spark_emb(transe_step(emb0, pairs, lr=0.05, margin=2.0))
    exp1 = pstep(pinit(IDS, 4), RAW_PAIRS, lr=0.05, margin=2.0)
    assert got1 == exp1           # EXACT float equality, step 1
    # step 2 compounds: feed the updated table back in
    emb1 = spark.createDataFrame(
        [(k, v) for k, v in got1.items()], "id string, emb array<double>"
    )
    got2 = _spark_emb(transe_step(emb1, pairs, lr=0.05, margin=2.0))
    assert got2 == pstep(exp1, RAW_PAIRS, lr=0.05, margin=2.0)


def test_untouched_ids_keep_exact_embeddings(spark):
    ids = spark.createDataFrame(
        [(i,) for i in IDS + ["e:island"]], "id string"
    )
    emb0 = init_embeddings(ids, dim=4, seed=0)
    pairs = spark.createDataFrame(RAW_PAIRS, PAIRS)
    before = _spark_emb(emb0)
    after = _spark_emb(transe_step(emb0, pairs))
    assert after["e:island"] == before["e:island"]


def test_margin_loss_decreases(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "id string")
    pairs = spark.createDataFrame(RAW_PAIRS, PAIRS)
    pos = pairs.select("subj", "pred", "obj")
    neg = pairs.select(
        "subj", "pred", F.col("neg_obj").alias("obj")
    )

    def loss(emb):
        dp = {
            (r.subj, r.obj): r.dist
            for r in transe_distance(emb, pos).collect()
        }
        dn = {
            (r.subj, r.obj): r.dist
            for r in transe_distance(emb, neg).collect()
        }
        return sum(
            max(0.0, 1.0 + dp[(s, o)] - dn[(s, n)])
            for s, _, o, n in RAW_PAIRS
        )

    emb = init_embeddings(ids, dim=8, seed=0)
    l0 = loss(emb)
    for _ in range(3):
        emb = spark.createDataFrame(
            [(k, v) for k, v in _spark_emb(transe_step(emb, pairs)).items()],
            "id string, emb array<double>",
        )
    l3 = loss(emb)
    assert l3 < l0


def test_step_plan_no_python_no_window_no_cartesian(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "id string")
    emb0 = init_embeddings(ids, dim=4, seed=0)
    pairs = spark.createDataFrame(RAW_PAIRS, PAIRS)
    plan = (
        transe_step(emb0, pairs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
