"""Entity-tuple beam search as iterative DataFrame joins — the
centerpiece operator (north_star: "candidate entity-pair beam search
re-expressed as iterative DataFrame joins with broadcast of the
prompt/paraphrase table").

Re-expresses the reference's recursive DFS
(reference ``models/entity_tuple_searcher.py:13-228``) as a bounded
driver loop over a *frontier* DataFrame:

  frontier row = (rel, t, n_masks, ent_idx, ents, ent_logprobs,
                  token_ids, token_logprobs)

Each iteration appends ONE token to every live row via an
Arrow-batched ``mapInPandas`` expansion (P2: ONE ``mask_logits_batch``
call per Arrow batch over all (row × prompt) jobs → weighted-average
over the broadcast prompt ensemble → banned-ids mask → log-softmax →
top-B among post-softmax candidates, reference
``entity_tuple_searcher.py:169-228``), then prunes JVM-side with
window ranks:

  * completed entities: decode + filters F4–F8, dedup per parent,
    W3 cap (n for the first entity, max_word_repeat deeper —
    ``entity_tuple_searcher.py:79-87``);
  * in-progress token paths: top ``token_beam_width`` per parent node.

The loop runs ≤ Σ n_masks ≤ n_ents·max_ent_subwords iterations
(≤6 with reference defaults) — the reference's recursion depth bound
(SURVEY.md §3.1). The reference's sequential heap-threshold pruning
(``entity_tuple_searcher.py:200-209``) is replaced by deterministic
per-level top-B + final exact re-ranking (SURVEY.md §7): safe because
a tuple's score is the *min* of its entity logprobs, monotone
non-increasing as the tuple extends.

Scale notes: the frontier is repartitioned by (rel, t) hash each
iteration and localCheckpoint()ed to cut lineage; prompts/relation
metadata ride inside the UDF closure (broadcast, tiny); all heavy
pruning is WindowExec over the shuffle keys, no driver collect of
candidate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql import types as T

from ..config import HarvestConfig
from ..functions.textops import get_n_masks
from .scoring_udf import SEP

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("rel", T.StringType(), False),
        T.StructField("t", T.IntegerType(), False),
        T.StructField("n_masks", T.ArrayType(T.IntegerType()), False),
        T.StructField("ent_idx", T.IntegerType(), False),
        T.StructField("ents", T.ArrayType(T.StringType()), False),
        T.StructField("ent_logprobs", T.ArrayType(T.DoubleType()), False),
        T.StructField("token_ids", T.ArrayType(T.IntegerType()), False),
        T.StructField("token_logprobs", T.ArrayType(T.DoubleType()), False),
    ]
)


def build_rel_info(prompt_weights: DataFrame, relations: DataFrame) -> dict:
    """Driver-side collect of the tiny prompt ensemble: {rel:
    {"prompts": [(prompt, weight)...], "n_ents": int}} — broadcast to
    executors inside the expansion-UDF closure (J3)."""
    arity = {r["rel"]: r["n_ents"] for r in relations.select("rel", "n_ents").collect()}
    info: dict = {}
    for row in prompt_weights.orderBy("rel", F.desc("weight"), "prompt").collect():
        info.setdefault(row["rel"], {"prompts": [], "n_ents": arity[row["rel"]]})
        info[row["rel"]]["prompts"].append((row["prompt"], float(row["weight"])))
    return info


def init_frontier(spark: SparkSession, rel_info: dict, cfg: HarvestConfig) -> DataFrame:
    """One row per (rel, subword-config t) — reference
    ``entity_tuple_searcher.py:19-23``."""
    rows = []
    for rel, meta in sorted(rel_info.items()):
        n_ents = meta["n_ents"]
        for t in range(cfg.max_ent_subwords**n_ents):
            n_masks = get_n_masks(t=t, n_ents=n_ents, max_ent_subwords=cfg.max_ent_subwords)
            rows.append((rel, t, n_masks, 0, [], [], [], []))
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def make_expand_fn(
    lm_name: str, seed: int, rel_info: dict, width: int,
    allowed_token_ids: list[int] | dict[str, list[int]] | None = None,
    mask_payload: tuple[int, bytes, bytes] | None = None,
):
    """Arrow-batched beam expansion (P2). Two passes per batch:

    1. build every (filled prompt, mask position) job across ALL
       frontier rows of the batch (deduped by text), then ONE
       ``lm.mask_logits_batch`` call — never a forward per
       (row × prompt) (the round-1 scale-killer; a real MLM backend
       packs these into padded forwards under a token budget);
    2. per row: weighted-average the prompt-ensemble logits, mask the
       banned ids to -inf, log-softmax, then pick top-B among the
       POST-softmax candidate set.

    Mask-order parity (reference ``entity_tuple_searcher.py:199-228``):
    only ``banned_ids`` (specials + stopwords) are -inf'd BEFORE
    log-softmax; the F9 char filters — and our corpus-grounding
    extension — are candidate *selection* filters applied AFTER, with
    no renormalization, exactly like the reference's ``continue``
    inside the sorted-logit loop.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        from ..functions.textops import (
            entity_conflicts_with_tuple,
            entity_in_any_prompt,
            entity_passes_filters,
            get_mask_place,
        )
        from ..lm import resolve_lm, unpack_token_masks

        lm = resolve_lm(lm_name, seed)
        if mask_payload is not None:
            char_ok, banned = unpack_token_masks(mask_payload)
        else:
            char_ok = lm.allowed_token_mask()  # memoized per process
            banned = np.zeros(lm.vocab_size, dtype=bool)
            banned[lm.banned_ids] = True
        cand_ok = char_ok & ~banned
        per_rel_ids = None
        if isinstance(allowed_token_ids, dict):
            # per-relation grounding (corpus_token_ids_per_relation):
            # each relation restricts to tokens attested on pages that
            # mention its seed entities; masks built lazily per rel
            per_rel_ids = {
                r: np.asarray(v, dtype=np.int64)
                for r, v in allowed_token_ids.items()
            }
        elif allowed_token_ids is not None:
            # corpus grounding (J6): only tokens attested in the
            # web_pages corpus may fill entity slots. Sized to the mask
            # width, NOT lm.vocab_size — the payload mask can be wider
            # than the tokenizer vocab (added specials at/above
            # tok.vocab_size, e.g. DeBERTa-v3's [MASK]), and ids are
            # clipped to that width for the same reason.
            ground = np.zeros(len(cand_ok), dtype=bool)
            ids = np.asarray(allowed_token_ids, dtype=np.int64)
            ground[ids[ids < len(cand_ok)]] = True
            cand_ok &= ground
        neg_inf = -float("inf")
        all_cand_ids = np.nonzero(cand_ok)[0]
        fitted = [len(cand_ok)]
        rel_cand_cache: dict = {}

        def cand_ids_for(rel):
            """Candidate ids for one relation (== the global set unless
            per-relation grounding is active)."""
            if per_rel_ids is None:
                return all_cand_ids
            got = rel_cand_cache.get(rel)
            if got is None:
                ids = per_rel_ids.get(rel)
                if ids is None:
                    got = np.empty(0, dtype=np.int64)
                else:
                    g = np.zeros(len(cand_ok), dtype=bool)
                    g[ids[ids < len(cand_ok)]] = True
                    got = np.nonzero(cand_ok & g)[0]
                rel_cand_cache[rel] = got
            return got

        def fit_width(n: int):
            """Fit the masks to the model-head width: some HF models pad
            the embedding matrix past tok.vocab_size (DeBERTa-v3 etc.),
            so logits can be wider than tokenizer-derived masks. Padded
            ids keep reference normalization (NOT -inf'd — the
            reference only bans tokenizer ids) but are never selectable
            candidates."""
            nonlocal banned, cand_ok, all_cand_ids
            if fitted[0] == n:
                return

            def fit(mask):
                if len(mask) >= n:
                    return mask[:n]
                out = np.zeros(n, dtype=bool)
                out[: len(mask)] = mask
                return out

            banned = fit(banned)
            cand_ok = fit(cand_ok)
            all_cand_ids = np.nonzero(cand_ok)[0]
            rel_cand_cache.clear()  # per-rel masks depend on the width
            fitted[0] = n

        for pdf in batches:
            out = {c: [] for c in pdf.columns}
            if per_rel_ids is None and all_cand_ids.size == 0:
                continue  # grounding left no legal tokens — nothing to expand

            def emit(rel, t, n_masks, ent_idx, ents, elps, tids, tlps):
                out["rel"].append(rel)
                out["t"].append(t)
                out["n_masks"].append(n_masks)
                out["ent_idx"].append(ent_idx)
                out["ents"].append(ents)
                out["ent_logprobs"].append(elps)
                out["token_ids"].append(tids)
                out["token_logprobs"].append(tlps)

            # ---- pass 1: collect every LM job in the Arrow batch ----
            texts: list[str] = []
            text_idx: dict[str, int] = {}
            row_meta = []  # (row, level_prompts, [(job, mask_idx, w)], wsum)
            for row in pdf.itertuples(index=False):
                if cand_ids_for(row.rel).size == 0:
                    continue  # this relation's grounding is empty
                meta = rel_info[row.rel]
                n_masks = list(row.n_masks)
                ent_idx = int(row.ent_idx)
                ents = list(row.ents)
                k = n_masks[ent_idx]
                tids = list(row.token_ids)

                # level prompts: slots < ent_idx filled (J3,
                # entity_tuple_searcher.py:103-106)
                level_prompts = []
                for p, w in meta["prompts"]:
                    for j, e in enumerate(ents):
                        p = p.replace(f"<ENT{j}>", e)
                    level_prompts.append((p, w))

                slot_text = lm.partial_slot_text(tids, k - len(tids))
                jobs = []
                wsum = 0.0
                for lp, w in level_prompts:
                    filled = lp.replace(f"<ENT{ent_idx}>", slot_text)
                    for j in range(len(n_masks)):
                        if j != ent_idx:
                            filled = filled.replace(
                                f"<ENT{j}>", lm.masked_run(n_masks[j])
                            )
                    ji = text_idx.setdefault(filled, len(texts))
                    if ji == len(texts):
                        texts.append(filled)
                    jobs.append((ji, get_mask_place(ent_idx, n_masks, lp), w))
                    wsum += w
                row_meta.append((row, level_prompts, jobs, wsum))

            all_logits = lm.mask_logits_batch(texts)
            if texts:
                fit_width(int(all_logits[0].shape[-1]))

            # ---- pass 2: combine, normalize, select, filter ----
            for row, level_prompts, jobs, wsum in row_meta:
                n_masks = list(row.n_masks)
                ent_idx = int(row.ent_idx)
                ents = list(row.ents)
                k = n_masks[ent_idx]
                tids = list(row.token_ids)
                tlps = list(row.token_logprobs)

                total = None
                for ji, mask_idx, w in jobs:
                    logits = all_logits[ji][mask_idx]
                    total = logits * w if total is None else total + logits * w
                total = total / wsum
                total[banned] = neg_inf  # F10 pre-softmax, lm_wrapper order
                m = total.max()
                logprobs = total - (m + np.log(np.exp(total - m).sum()))

                # top-B among post-softmax candidates, tiebreak by id
                cand_ids = cand_ids_for(row.rel)
                if cand_ids.size == 0:
                    continue
                cand_lps = logprobs[cand_ids]
                order = np.lexsort((cand_ids, -cand_lps))[:width]
                for idx in order:
                    tid = int(cand_ids[idx])
                    lpv = float(cand_lps[idx])
                    ntids = tids + [tid]
                    ntlps = tlps + [lpv]
                    if len(ntids) < k:
                        emit(row.rel, row.t, n_masks, ent_idx, ents,
                             list(row.ent_logprobs), ntids, ntlps)
                        continue
                    # entity completed → decode + F4-F8
                    pred = lm.decode(ntids).strip().lower()
                    if not entity_passes_filters(pred):
                        continue
                    if entity_conflicts_with_tuple(pred, ents):
                        continue
                    if entity_in_any_prompt(pred, [p for p, _ in level_prompts]):
                        continue
                    emit(row.rel, row.t, n_masks, ent_idx + 1, ents + [pred],
                         list(row.ent_logprobs) + [min(ntlps)], [], [])
            if not out["rel"]:
                # empty pd.DataFrame defaults to float64 columns, which
                # Arrow cannot cast to list<> types — yield nothing
                continue

            yield pd.DataFrame(out, columns=list(pdf.columns))

    return fn


def _prune_completed(df: DataFrame, cfg: HarvestConfig) -> DataFrame:
    """Dedup same entity per parent (keep best logprob), then W3 cap:
    top-n for the first entity, top-max_word_repeat deeper."""
    parent = F.concat_ws(
        SEP,
        F.col("rel"),
        F.col("t").cast("string"),
        F.concat_ws(SEP, F.slice("ents", 1, F.size("ents") - 1)),
    )
    pred = F.element_at("ents", -1)
    lp = F.element_at("ent_logprobs", -1)
    df = df.withColumn("_parent", parent).withColumn("_pred", pred).withColumn("_lp", lp)
    dd = W.partitionBy("_parent", "_pred").orderBy(F.desc("_lp"))
    df = df.withColumn("_dd", F.row_number().over(dd)).filter(F.col("_dd") == 1)
    cap = F.when(F.col("ent_idx") == 1, F.lit(cfg.max_n_ent_tuples)).otherwise(
        F.lit(cfg.max_word_repeat)
    )
    w3 = W.partitionBy("_parent").orderBy(F.desc("_lp"), F.asc("_pred"))
    df = df.withColumn("_rn", F.row_number().over(w3)).filter(F.col("_rn") <= cap)
    return df.drop("_parent", "_pred", "_lp", "_dd", "_rn")


def _prune_inprogress(df: DataFrame, cfg: HarvestConfig) -> DataFrame:
    parent = F.concat_ws(
        SEP, F.col("rel"), F.col("t").cast("string"),
        F.col("ent_idx").cast("string"), F.concat_ws(SEP, "ents"),
    )
    score = F.array_min("token_logprobs")
    path = F.concat_ws(",", F.transform("token_ids", lambda x: x.cast("string")))
    w = W.partitionBy(parent).orderBy(F.desc(score), F.asc(path))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cfg.token_beam_width)
        .drop("_rn")
    )


def search_ent_tuples(
    spark: SparkSession,
    prompt_weights: DataFrame,
    relations: DataFrame,
    cfg: HarvestConfig,
    allowed_token_ids: list[int] | dict[str, list[int]] | None = None,
) -> DataFrame:
    """→ candidate tuples (rel, ents, min_logprob), before the
    word-repeat cap / top-n (finalize_candidates). Pass
    ``allowed_token_ids`` to restrict entity tokens to corpus-attested
    words: a flat list (corpus_grounding.corpus_token_ids, global
    vocabulary) or a per-relation dict
    (corpus_token_ids_per_relation, tokens attested on pages
    mentioning that relation's seed entities)."""
    from ..lm import token_mask_payload

    rel_info = build_rel_info(prompt_weights, relations)
    if not rel_info:
        return spark.createDataFrame([], "rel string, ents array<string>, min_logprob double")
    expand = make_expand_fn(
        cfg.lm, cfg.seed, rel_info, cfg.token_beam_width, allowed_token_ids,
        mask_payload=token_mask_payload(cfg.lm, cfg.seed),
    )

    frontier = init_frontier(spark, rel_info, cfg)
    done: list[DataFrame] = []
    thresholds: dict[str, float] = {}  # rel -> prunable min_logprob
    raw_seen = False  # latched: some relation reached k raw candidates
    max_iters = max(
        sum(get_n_masks(t, m["n_ents"], cfg.max_ent_subwords))
        for m in rel_info.values()
        for t in range(cfg.max_ent_subwords ** m["n_ents"])
    )

    for _ in range(max_iters):
        # One expansion materialization per iteration: the LM-heavy
        # mapInPandas output is checkpointed once; the window prunes
        # and the finished/live split all read from that checkpoint.
        # cols-only repartition → AQE coalesces the tiny shuffles that a
        # fixed numPartitions would pin at shuffle_partitions tasks
        children = (
            frontier.repartition("rel", "t", "ents")
            .mapInPandas(expand, schema=FRONTIER_SCHEMA)
            .localCheckpoint(eager=True)
        )
        if children.isEmpty():  # cheap on materialized checkpoint
            break
        # r6: materialize the completed-prune ONCE per iteration. The
        # former lazy `done` chunks re-executed each prior iteration's
        # TWO prune windows inside every threshold job (8 window
        # shuffles by iteration 3 — measured 3.0 s of the 9.3 s
        # steady-state harvest) and again in the final union; one
        # ~0.25 s eager checkpoint per iteration buys all of that back
        # (guide §5 "localCheckpoint to cut lineage").
        completed = _prune_completed(
            children.filter(F.size("token_ids") == 0), cfg
        ).localCheckpoint(eager=True)
        inprog = _prune_inprogress(children.filter(F.size("token_ids") > 0), cfg)

        n_ents_col = F.size("n_masks")
        finished = completed.filter(F.col("ent_idx") == n_ents_col)
        live = completed.filter(F.col("ent_idx") < n_ents_col)
        done.append(
            finished.select(
                "rel", "ents", F.array_min("ent_logprobs").alias("min_logprob")
            )
        )
        frontier = live.unionByName(inprog)

        if cfg.prune_slack is not None and done:
            # Branch-and-bound mirroring the reference's heap threshold
            # (entity_tuple_searcher.py:76-77: the bar is the n-th best
            # tuple CURRENTLY ACCEPTED UNDER WORD CAPS — tuples the cap
            # rejects never enter the heap). We therefore run the exact
            # word-cap greedy over the accumulated candidates and take
            # the k-th ACCEPTED score, k = slack·n — strictly more
            # conservative than both the raw k-th rank and the
            # reference's own k=n bar. Still a HEURISTIC, not exact:
            # a future high-scoring tuple can evict an accepted one via
            # word caps and force the final greedy below today's bar
            # (the reference's threshold has the same property); see
            # SURVEY.md §7 and ADVICE r1.
            k = max(1, int(cfg.max_n_ent_tuples * cfg.prune_slack))
            acc = done[0]
            for d in done[1:]:
                acc = acc.unionByName(d)
            # Lossless precheck: the bar exists only once a relation has
            # >= k ACCEPTED tuples, and accepted <= raw — so while no
            # relation has even k raw candidates, skip the (Python
            # greedy + collect) job entirely. Early beam levels always
            # hit this. Raw counts only grow, so the check latches:
            # once satisfied it never runs again (no extra aggregation
            # job on mid/late iterations).
            if not raw_seen:
                raw_seen = not (
                    acc.groupBy("rel")
                    .agg(F.count(F.lit(1)).alias("_c"))
                    .filter(F.col("_c") >= k)
                    .isEmpty()
                )
            thresholds: dict[str, float] = {}
            if raw_seen:
                # r6: collect the greedy's accepted rows directly
                # (bounded: ≤ k rows per relation by construction) and
                # fold count/min in the driver — the former
                # groupBy+filter round trip added one exchange + job
                # per prune iteration for the same ≤|rels| numbers.
                accepted = finalize_candidates_greedy(acc, cfg, max_n=k)
                stats: dict[str, tuple[int, float]] = {}
                for r in accepted.select("rel", "min_logprob").collect():
                    c, m = stats.get(r["rel"], (0, float("inf")))
                    stats[r["rel"]] = (c + 1, min(m, r["min_logprob"]))
                thresholds = {
                    rel: m for rel, (c, m) in stats.items() if c >= k
                }  # bar defined once k accepted
            if thresholds:
                th_df = F.broadcast(
                    spark.createDataFrame(
                        [(r, float(v)) for r, v in sorted(thresholds.items())],
                        "rel string, _th double",
                    )
                )
                running_min = F.least(
                    F.coalesce(F.array_min("ent_logprobs"), F.lit(float("inf"))),
                    F.coalesce(F.array_min("token_logprobs"), F.lit(float("inf"))),
                )
                # broadcast join, not an O(#rels) when-chain: ekar has
                # 487 relations (VERDICT r1 item 5/8)
                frontier = (
                    frontier.join(th_df, "rel", "left")
                    .filter(F.col("_th").isNull() | (running_min >= F.col("_th")))
                    .drop("_th")
                )

        # eager frontier checkpoint: measured faster than leaving the
        # window prunes + threshold join to re-run inside the next
        # expansion's shuffle-write stage (12.8s vs 11.1s bench harvest)
        frontier = frontier.localCheckpoint(eager=True)

    if not done:
        return spark.createDataFrame(
            [], "rel string, ents array<string>, min_logprob double"
        )
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


def finalize_candidates_greedy(
    candidates: DataFrame, cfg: HarvestConfig, max_n: int | None = None
) -> DataFrame:
    """O1 dedup + A6 word-repeat cap (exact greedy) + W2 top-n.

    Reference semantics (``entity_tuple_searcher.py:53-71``): accept
    tuples in score order; a tuple is rejected if ANY of its word
    occurrences would push that word's count past ``max_word_repeat``
    (each occurrence checked against the pre-acceptance count);
    accepted tuples increment counts by multiplicity; stop at n.

    ``max_n`` overrides ``cfg.max_n_ent_tuples`` (the prune-threshold
    path digs ``slack·n`` deep with the same greedy).

    The greedy scan is sequential per relation but tiny (post-dedup
    candidates), so it runs as one ``applyInPandas`` group per
    relation — parallel across relations, exact within one.
    """
    import pandas as pd  # noqa: F401 (schema doc)

    max_word_repeat = cfg.max_word_repeat
    max_n = cfg.max_n_ent_tuples if max_n is None else max_n

    def greedy(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            by=["min_logprob", "_ek"], ascending=[False, True], kind="mergesort"
        )
        # O1 dedup fused into the greedy (r6): keep the best-scoring row
        # per tuple key. Sorted desc + keep="first" == the former
        # groupBy(rel, _ek).agg(max(min_logprob)) pre-shuffle, but saves
        # one full exchange + stage per invocation — this runs on every
        # prune-threshold iteration of the beam loop (guide §2.4).
        pdf = pdf.drop_duplicates(subset=["_ek"], keep="first")
        counts: dict[str, int] = {}
        keep_rows = []
        for row in pdf.itertuples(index=False):
            if len(keep_rows) >= max_n:
                break
            words = [w for e in row.ents for w in e.split()]
            if any(counts.get(w, 0) + 1 > max_word_repeat for w in words):
                continue
            for w in words:
                counts[w] = counts.get(w, 0) + 1
            keep_rows.append(row)
        if not keep_rows:
            return pdf.iloc[0:0]  # preserves Arrow-compatible dtypes
        return pd.DataFrame(keep_rows, columns=list(pdf.columns))

    ek = F.concat_ws(SEP, "ents")
    cand = candidates.withColumn("_ek", ek)
    out = cand.groupBy("rel").applyInPandas(
        greedy, schema="rel string, _ek string, ents array<string>, min_logprob double"
    )
    return out.select("rel", "ents", "min_logprob")


def finalize_candidates(candidates: DataFrame, cfg: HarvestConfig) -> DataFrame:
    """O1 dedup + A6 word-repeat cap + W2 top-n per relation.

    Dispatches on ``cfg.word_cap_exact``: the exact greedy
    (finalize_candidates_greedy, reference-faithful) or the fully
    window-based relaxation below, which ranks tuples per relation by
    (min_logprob desc, ents) and keeps a tuple iff every one of its
    word occurrences is within the first ``max_word_repeat`` for that
    word (SURVEY.md §2.4 A6).
    """
    if getattr(cfg, "word_cap_exact", True):
        return finalize_candidates_greedy(candidates, cfg)
    ek = F.concat_ws(SEP, "ents")
    cand = (
        candidates.withColumn("_ek", ek)
        .groupBy("rel", "_ek")
        .agg(F.first("ents").alias("ents"), F.max("min_logprob").alias("min_logprob"))
    )
    wt = W.partitionBy("rel").orderBy(F.desc("min_logprob"), F.asc("_ek"))
    cand = cand.withColumn("tuple_rank", F.row_number().over(wt))

    words = cand.select(
        "rel", "_ek", "tuple_rank",
        F.posexplode(F.flatten(F.transform("ents", lambda e: F.split(e, " ")))).alias(
            "wpos", "word"
        ),
    )
    ww = W.partitionBy("rel", "word").orderBy(F.asc("tuple_rank"), F.asc("wpos"))
    occ = words.withColumn("word_occ", F.row_number().over(ww))
    bad = (
        occ.groupBy("rel", "_ek")
        .agg(F.max("word_occ").alias("max_occ"))
        .filter(F.col("max_occ") > cfg.max_word_repeat)
        .select("rel", "_ek")
    )
    kept = cand.join(bad, ["rel", "_ek"], "left_anti")
    w2 = W.partitionBy("rel").orderBy(F.asc("tuple_rank"))
    return (
        kept.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= cfg.max_n_ent_tuples)
        .select("rel", "ents", "min_logprob")
    )
