"""J6 corpus grounding of the beam vocabulary: with
ground_beam_to_corpus=True, every word of every harvested entity must
be attested in the web_pages corpus."""

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.lm import build_stub_lm
from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
    corpus_token_ids,
    tokenize_corpus,
)
from knowledge_harvest_from_lms_spark.plans.full_pipeline import run_full_pipeline
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations
from knowledge_harvest_from_lms_spark.sources.web_pages import synth_web_pages


def test_corpus_token_ids_semijoin(spark):
    pages = synth_web_pages(spark, 200, seed=42, n_partitions=2)
    lm = build_stub_lm()
    ids = corpus_token_ids(pages, lm)
    corpus_words = {
        r.word for r in tokenize_corpus(pages).select("word").distinct().collect()
    }
    assert ids, "synth corpus embeds fixture entity sentences"
    assert all(lm.token_text(i).lower() in corpus_words for i in ids)


def test_grounding_mask_fits_wide_payload():
    """Regression (ADVICE r2): when the driver payload is wider than
    tok.vocab_size (added specials at/above vocab, e.g. DeBERTa-v3's
    [MASK]), the grounding mask must size to the payload width — the
    old `np.zeros(lm.vocab_size)` crashed every expansion task with a
    numpy shape mismatch. Ids at/above the payload width are clipped."""
    import numpy as np
    import pandas as pd

    from knowledge_harvest_from_lms_spark.lm import token_mask_payload, unpack_token_masks
    from knowledge_harvest_from_lms_spark.operators.beam_search import make_expand_fn

    lm = build_stub_lm()
    vocab, char_b, banned_b = token_mask_payload("stub")
    wide = vocab + 7  # simulate added specials past tok.vocab_size
    char_ok, banned = unpack_token_masks((vocab, char_b, banned_b))
    wide_payload = (
        wide,
        np.packbits(np.concatenate([char_ok, np.zeros(7, bool)])).tobytes(),
        np.packbits(np.concatenate([banned, np.ones(7, bool)])).tobytes(),
    )
    allowed = [int(i) for i in np.nonzero(char_ok)[0][:50]] + [wide + 3]  # one out-of-range id
    rels = {r["rel"]: r for r in _fixture_rel_info()}
    fn = make_expand_fn("stub", 42, rels, width=4,
                        allowed_token_ids=allowed, mask_payload=wide_payload)
    rel = next(iter(rels))
    pdf = pd.DataFrame({
        "rel": [rel], "t": [0], "n_masks": [[1, 1]], "ent_idx": [0],
        "ents": [[]], "ent_logprobs": [[]], "token_ids": [[]], "token_logprobs": [[]],
    })
    outs = list(fn(iter([pdf])))  # must not raise; output may be empty
    for out in outs:
        assert set(out.columns) == set(pdf.columns)


def _fixture_rel_info():
    from knowledge_harvest_from_lms_spark.sources.fixtures import FIXTURE_RELATIONS

    rows = []
    for r in FIXTURE_RELATIONS[:1]:
        prompts = [(p, 1.0) for p in r["init_prompts"]]
        from knowledge_harvest_from_lms_spark.functions.textops import get_n_ents

        rows.append({"rel": r["rel"], "n_ents": get_n_ents(r["init_prompts"][0]),
                     "prompts": prompts})
    return rows


def test_grounded_harvest_entities_attested(spark, tmp_path):
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pages = synth_web_pages(spark, 400, seed=42, n_partitions=4)
    cfg = HarvestConfig(
        max_n_ent_tuples=10, token_beam_width=6, max_ent_subwords=1,
        shuffle_partitions=8, ground_beam_to_corpus=True,
    )
    out = run_full_pipeline(spark, rels, pages, str(tmp_path), cfg)
    triples = out["triples"].collect()
    assert triples
    corpus_words = {
        r.word for r in tokenize_corpus(pages).select("word").distinct().collect()
    }
    for t in triples:
        for ent in t.ents:
            for w in ent.lower().split():
                assert w in corpus_words, (t.ents, w)


def test_corpus_token_ids_per_relation(spark):
    """Per-relation vocabularies: each relation grounds to the words of
    pages mentioning ITS seed entities only."""
    from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
        corpus_token_ids_per_relation,
    )

    # words drawn from the 131-word stub vocab so the vocab semi-join
    # keeps them
    pages = spark.createDataFrame(
        [
            ("u1", "bird africa airport bread"),
            ("u2", "boat bridge bottle"),
            ("u3", "artist battleground answer"),  # mentions no seeds
        ],
        "url string, text string",
    )
    rels = spark.createDataFrame(
        [
            ("AtLocation", [["bird", "africa"]]),
            ("CapableOf", [["boat", "bridge"]]),
        ],
        "rel string, seed_ent_tuples array<array<string>>",
    )
    lm = build_stub_lm()
    per_rel = corpus_token_ids_per_relation(pages, rels, lm)
    assert set(per_rel) == {"AtLocation", "CapableOf"}
    at_words = {lm.token_text(i).lower() for i in per_rel["AtLocation"]}
    cap_words = {lm.token_text(i).lower() for i in per_rel["CapableOf"]}
    # seed-co-occurring words only; the seedless page contributes to neither
    assert at_words == {"bird", "africa", "airport", "bread"}
    assert cap_words == {"boat", "bridge", "bottle"}
    assert "artist" not in at_words | cap_words


def test_per_relation_grounded_harvest(spark, tmp_path):
    """ground_beam_to_corpus='per_relation' end to end: every harvested
    entity word is attested on a page mentioning that relation's
    seeds, and a relation with NO seed hits harvests nothing rather
    than crashing."""
    from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
        corpus_token_ids_per_relation,
    )

    rels = fixture_relations(spark).filter("rel in ('AtLocation','CapableOf')")
    pages = synth_web_pages(spark, 400, seed=42, n_partitions=4)
    cfg = HarvestConfig(
        max_n_ent_tuples=8, token_beam_width=5, max_ent_subwords=1,
        shuffle_partitions=8, ground_beam_to_corpus="per_relation",
    )
    out = run_full_pipeline(spark, rels, pages, str(tmp_path), cfg)
    triples = out["triples"].collect()
    assert triples
    lm = build_stub_lm()
    per_rel = corpus_token_ids_per_relation(
        pages.select("url", "text"), rels, lm
    )
    rel_words = {
        rel: {lm.token_text(i).lower() for i in ids}
        for rel, ids in per_rel.items()
    }
    for t in triples:
        for ent in t.ents:
            for w in ent.lower().split():
                assert w in rel_words[t.rel], (t.rel, t.ents, w)


def test_corpus_token_ids_includes_bpe_word_start_tokens(spark):
    """Regression: byte-BPE word-initial tokens decode with a leading
    space (Ġdog -> " dog"); grounding must trim before matching or
    every roberta-style word-start token silently drops out."""
    from knowledge_harvest_from_lms_spark.lm import resolve_lm

    pages = spark.createDataFrame(
        [("u1", "the dog is in the house")], "url string, text string"
    )
    lm = resolve_lm("fake-bpe")
    ids = corpus_token_ids(pages, lm)
    texts = {lm.token_text(i) for i in ids}
    assert " dog" in texts or "dog" in texts
    assert any(t.startswith(" ") for t in texts), (
        "no word-start (space-decoded) tokens grounded"
    )


def test_per_relation_empty_grounding_skips_relation():
    """A relation whose grounding dict entry is missing/empty expands
    to NOTHING (skipped in pass 1, no LM work) while other relations
    proceed — no crash, no cross-relation leakage."""
    import pandas as pd

    from knowledge_harvest_from_lms_spark.operators.beam_search import make_expand_fn

    lm = build_stub_lm()
    rels = {r["rel"]: r for r in _fixture_rel_info()}
    rel = next(iter(rels))
    grounded_ids = [int(i) for i in range(4, lm.vocab_size)]
    fn = make_expand_fn(
        "stub", 42, rels, width=4,
        allowed_token_ids={rel: grounded_ids, "GhostRel": []},
    )
    pdf = pd.DataFrame({
        "rel": [rel], "t": [0], "n_masks": [[1, 1]], "ent_idx": [0],
        "ents": [[]], "ent_logprobs": [[]], "token_ids": [[]], "token_logprobs": [[]],
    })
    outs = list(fn(iter([pdf])))
    assert outs and len(outs[0]) > 0  # grounded relation expands

    # same frontier row under a rel with EMPTY grounding: nothing
    fn_empty = make_expand_fn(
        "stub", 42, rels, width=4, allowed_token_ids={},
    )
    assert list(fn_empty(iter([pdf]))) == []


def test_per_relation_punct_mode_matches_punctuated_seeds(spark):
    """Seeds are tokenized with the SAME word_mode as the corpus: a
    punctuated seed ("bird's") must still hit pages in punct mode
    (space mode would keep \"bird's\" whole and match nothing)."""
    from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
        corpus_token_ids_per_relation,
    )

    pages = spark.createDataFrame(
        [("u1", "the bird's, africa! and bread")], "url string, text string"
    )
    rels = spark.createDataFrame(
        [("AtLocation", [["bird's", "africa"]])],
        "rel string, seed_ent_tuples array<array<string>>",
    )
    lm = build_stub_lm()
    space = corpus_token_ids_per_relation(pages, rels, lm, word_mode="space")
    punct = corpus_token_ids_per_relation(pages, rels, lm, word_mode="punct")
    # space mode: every seed mention is punctuation-glued ("bird's," /
    # "africa!"), so no page hits and no grounding
    assert space.get("AtLocation") is None
    words = {lm.token_text(i).lower() for i in punct["AtLocation"]}
    assert {"bird", "africa", "bread"} <= words


def test_windowed_cooccurrence_scopes_vocab_to_local_context(spark):
    """cooccur_window=k keeps only words within ±k raw token positions
    of a seed occurrence: a word on the same page but outside every
    seed window is excluded; window mode is always a subset of page
    mode; the seed word itself is always attested (distance 0)."""
    from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
        corpus_token_ids_per_relation,
        relation_word_cooccurrence,
    )

    # seed "bird" at pos 0: ±2 covers {bird, africa, airport};
    # "bread" (pos 3) and "boat" (pos 4) are on-page but out of window
    pages = spark.createDataFrame(
        [("u1", "bird africa airport bread boat")],
        "url string, text string",
    )
    rels = spark.createDataFrame(
        [("AtLocation", [["bird"]])],
        "rel string, seed_ent_tuples array<array<string>>",
    )
    lm = build_stub_lm()
    win = corpus_token_ids_per_relation(pages, rels, lm, cooccur_window=2)
    page = corpus_token_ids_per_relation(pages, rels, lm)
    win_words = {lm.token_text(i).lower() for i in win["AtLocation"]}
    page_words = {lm.token_text(i).lower() for i in page["AtLocation"]}
    assert win_words == {"bird", "africa", "airport"}
    assert page_words == {"bird", "africa", "airport", "bread", "boat"}
    assert win_words <= page_words

    # positions are RAW array indices: a double space shifts later
    # words' positions, and the window honours the raw offsets
    pages2 = spark.createDataFrame(
        [("u1", "bird  africa airport")],  # africa at RAW pos 2
        "url string, text string",
    )
    rw = relation_word_cooccurrence(pages2, rels, cooccur_window=1)
    words = {r.word for r in rw.collect()}
    assert words == {"bird"}, words  # africa now at distance 2


def test_window_vocab_monotone_and_converges_to_page_mode(spark):
    """Vocabulary grows monotonically with the window and equals page
    mode once the window covers the longest page (window mode can
    never see words page mode doesn't — both are restricted to hit
    pages)."""
    from knowledge_harvest_from_lms_spark.operators.corpus_grounding import (
        relation_word_cooccurrence,
    )

    pages = spark.createDataFrame(
        [
            ("u1", "bird africa airport bread boat bridge bottle"),
            ("u2", "artist answer bird"),
            ("u3", "doctor engine garden"),  # no seed: never contributes
        ],
        "url string, text string",
    )
    rels = spark.createDataFrame(
        [("AtLocation", [["bird"]])],
        "rel string, seed_ent_tuples array<array<string>>",
    )

    def vocab(window):
        df = relation_word_cooccurrence(pages, rels, cooccur_window=window)
        return {r.word for r in df.collect()}

    page = vocab(None)
    prev = set()
    for k in (0, 1, 2, 100):
        cur = vocab(k)
        assert prev <= cur, (prev, cur)
        assert cur <= page, (k, cur - page)
        prev = cur
    assert vocab(0) == {"bird"}
    assert vocab(100) == page
    assert "doctor" not in page
