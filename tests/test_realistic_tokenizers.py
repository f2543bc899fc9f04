"""Byte-BPE (roberta-style) and WordPiece (bert-style) fake tokenizers
driving the parity-critical PLL mask alignment (lm/hf.py:pll_row_plan,
reference models/language_model_wrapper.py:79-115) and the full beam —
the last previously-unexecuted parity surface (VERDICT r2 item 1).

Findings pinned here:
- byte-BPE aligns on EVERY (prompt x seed-tuple) combination across all
  four reference relation sets (conceptnet/human/lama/ekar_aggr);
- WordPiece misaligns on exactly ONE real reference prompt — conceptnet
  HasLastSubevent's glued slot "...that the<ENT0> event..." — where the
  reference itself would crash on its own
  `assert input_ids[l:r] == ent_token_ids`; our engine raises a defined
  PLLAlignmentError instead;
- BPE merges genuinely can cross the prefix/slot boundary when a slot
  abuts letters ("the<ENT0>" filled with "ree" -> "theree"), which is a
  defined PLLAlignmentError too (the reference: TypeError None + int).
"""

import itertools
import json
import os

import numpy as np
import pytest

from knowledge_harvest_from_lms_spark.config import HarvestConfig
from knowledge_harvest_from_lms_spark.functions.textops import entity_passes_filters
from knowledge_harvest_from_lms_spark.lm import resolve_lm, token_mask_payload
from knowledge_harvest_from_lms_spark.lm.fake_tokenizers import (
    ByteBPEFakeTokenizer,
    FakeByteBPEMLM,
    FakeWordPieceMLM,
    WordPieceFakeTokenizer,
)
from knowledge_harvest_from_lms_spark.lm.hf import PLLAlignmentError, pll_row_plan
from knowledge_harvest_from_lms_spark.operators.beam_search import (
    finalize_candidates,
    search_ent_tuples,
)
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations

REL_DIR = "/root/reference/relation_info"


# ---------------------------------------------------------------------------
# tokenizer structure
# ---------------------------------------------------------------------------

def test_bpe_structure():
    tok = ByteBPEFakeTokenizer()
    ids = tok.encode("The dog is part of a house.")
    assert ids[0] == tok.BOS_ID and ids[-1] == tok.EOS_ID
    assert tok.decode(ids) == "The dog is part of a house."
    # context-dependent encodings: word-initial-with-space carries the
    # space marker and tokenizes through different merges
    bare = tok.encode("dog", add_special_tokens=False)
    spaced = tok.encode(" dog", add_special_tokens=False)
    assert bare != spaced
    assert tok.decode(spaced) == " dog" and tok.decode(bare) == "dog"
    # GPT-2 pre-tokenizer: punctuation runs split from letters,
    # contractions split ("dog's" -> dog + ' + s or dog + 's)
    toks = [tok._rev[i] for i in tok.encode("dog's", add_special_tokens=False)]
    assert toks[0] == "dog" and "".join(toks) == "dog's"
    # mask token is atomic, runs concatenate, leading space swallowed
    assert tok.encode("a <mask><mask>.", add_special_tokens=False).count(
        tok.MASK_ID
    ) == 2
    # partial-slot shape: "do<mask>" keeps the word-start piece
    part = tok.encode(" do<mask> is", add_special_tokens=False)
    assert part[1] == tok.MASK_ID


def test_wp_structure():
    tok = WordPieceFakeTokenizer()
    ids = tok.encode("The dog's playground-style house.")
    pieces = [tok._rev[i] for i in ids]
    assert pieces[0] == "[CLS]" and pieces[-1] == "[SEP]"
    # basic tokenizer: every punctuation char its own token
    assert "'" in pieces and "-" in pieces and "." in pieces
    # ## continuations exist and decode fuses them
    assert any(p.startswith("##") for p in pieces)
    word = tok.encode("playground", add_special_tokens=False)
    assert len(word) > 1 and tok.decode(word) == "playground"
    # decode inserts spaces between non-continuation tokens (BERT
    # convert_tokens_to_string semantics)
    assert tok.decode(tok.encode("dog's", add_special_tokens=False)) == "dog ' s"
    # mask token is never split by the punctuation splitter
    assert tok.encode("a [MASK][MASK].", add_special_tokens=False).count(
        tok.MASK_ID
    ) == 2


@pytest.mark.parametrize("cls", [ByteBPEFakeTokenizer, WordPieceFakeTokenizer])
def test_cross_instance_id_determinism(cls):
    """Executors build their own tokenizer instances; ids must agree
    (beam token ids cross shuffle boundaries)."""
    a, b = cls(), cls()
    for text in ["The dog is part of a house.", "zzyqx unseen-word 42!"]:
        assert a.encode(text) == b.encode(text)
        assert a.decode(a.encode(text)) == b.decode(b.encode(text))


# ---------------------------------------------------------------------------
# PLL alignment sweep over the real reference relation sets
# ---------------------------------------------------------------------------

def _sweep(tok, max_seeds=3):
    ok, failures = 0, []
    for rel_set in ["conceptnet", "human", "lama", "ekar_aggr"]:
        info = json.load(open(f"{REL_DIR}/{rel_set}.json"))
        for rel, v in sorted(info.items()):
            prompts = list(dict.fromkeys(v["init_prompts"] + v.get("prompts", [])))
            seeds = [
                [e.replace("_", " ") for e in t]
                for t in v["seed_ent_tuples"][:max_seeds]
            ]
            for p, t in itertools.product(prompts, seeds):
                try:
                    ids, mp = pll_row_plan(tok, p, t)
                    assert mp, (p, t)
                    assert all(0 < x < len(ids) - 1 for x in mp), (p, t, mp)
                    ok += 1
                except PLLAlignmentError as e:
                    failures.append((rel_set, rel, p, tuple(t), str(e)))
    return ok, failures


needs_reference = pytest.mark.skipif(
    not os.path.isdir(REL_DIR), reason="reference relation_info not mounted"
)


@needs_reference
def test_pll_alignment_sweep_byte_bpe():
    """Every real reference prompt aligns under byte-BPE — mask
    positions land strictly inside the sentence and the located span
    equals the standalone-encoded entity tokens (the reference's own
    assert, language_model_wrapper.py:115)."""
    ok, failures = _sweep(ByteBPEFakeTokenizer())
    assert not failures, failures[:3]
    assert ok > 10000


@needs_reference
def test_pll_alignment_sweep_wordpiece():
    """WordPiece aligns everywhere EXCEPT conceptnet HasLastSubevent's
    glued-slot prompt ("...that the<ENT0> event...") — a real reference
    fragility (its own assert would fire on bert-family models). Pinned:
    the ONLY failures are that prompt, and they raise the defined
    PLLAlignmentError rather than a bare TypeError/AssertionError."""
    ok, failures = _sweep(WordPieceFakeTokenizer())
    assert ok > 10000
    assert failures, "expected the known HasLastSubevent glued-slot failures"
    for rel_set, rel, prompt, _t, _msg in failures:
        assert (rel_set, rel) == ("conceptnet", "HasLastSubevent")
        assert "the<ENT0>" in prompt


def test_bpe_cross_boundary_merge_is_defined_error():
    """A slot glued to letters can make a learned merge cross the
    prefix boundary: encode(prefix) is then NOT a sublist of
    encode(sent). The reference crashes with TypeError (None + int,
    language_model_wrapper.py:107); we raise PLLAlignmentError."""
    tok = ByteBPEFakeTokenizer()
    with pytest.raises(PLLAlignmentError, match="not a sublist"):
        pll_row_plan(tok, "the<ENT0> is near <ENT1>", ["ree", "house"])


def test_wp_glued_slot_is_defined_error():
    tok = WordPieceFakeTokenizer()
    with pytest.raises(PLLAlignmentError, match="span mismatch"):
        pll_row_plan(
            tok,
            "This means that the<ENT0> event triggers the <ENT1> event .",
            ["analyse", "make conclusion"],
        )


# ---------------------------------------------------------------------------
# backends: batch == loop, payload, full beam
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_batch_equals_loop(lm_name):
    lm = resolve_lm(lm_name)
    pairs = [
        ("<ENT0> is part of <ENT1>.", ["steering wheel", "car"]),
        ("You find <ENT0> in <ENT1> .", ["giraffe", "africa"]),
        ("<ENT0> can be used to <ENT1>.", ["knife", "cut"]),
    ]
    batched = lm.pll_mask_logprobs_batch(pairs, max_tokens_per_forward=64)
    for got, (p, e) in zip(batched, pairs):
        np.testing.assert_allclose(got, lm.pll_mask_logprobs(p, e), rtol=1e-12)


@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_token_mask_payload_builds(lm_name):
    payload = token_mask_payload(lm_name)
    assert payload is not None
    lm = resolve_lm(lm_name)
    assert payload[0] >= lm.vocab_size
    from knowledge_harvest_from_lms_spark.lm import unpack_token_masks

    char_ok, banned = unpack_token_masks(payload)
    assert char_ok.any() and banned.any()
    # every banned id decodes to a special or stopword
    from knowledge_harvest_from_lms_spark.functions.stopwords import STOPWORD_SET

    for tid in np.nonzero(banned)[0][:50]:
        text = lm.token_text(int(tid)).lower().strip()
        assert tid in set(int(i) for i in lm.banned_ids)
        assert text in STOPWORD_SET or not text.isalpha() or text in (
            "<s>", "</s>", "<unk>", "<pad>", "<mask>",
        ) or text.startswith("[")


@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_beam_end_to_end_realistic_tokenizers(spark, lm_name):
    """The full beam (expansion UDF, packed mask_logits_batch,
    partial_slot_text decode+mask shapes, candidate char filters) over
    the realistic tokenizer families, then determinism across
    partitionings."""
    cfg = HarvestConfig(
        max_n_ent_tuples=6, token_beam_width=5, max_ent_subwords=2,
        shuffle_partitions=8, lm=lm_name, prune_slack=None,
    )
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pw = spark.createDataFrame(
        [
            ("AtLocation", "<ENT0> is located in <ENT1> .", 0.6),
            ("AtLocation", "You find <ENT0> in <ENT1> .", 0.4),
        ],
        "rel string, prompt string, weight double",
    )
    raw = search_ent_tuples(spark, pw, rels, cfg)
    cand = finalize_candidates(raw, cfg).collect()
    assert cand, f"{lm_name} beam must complete tuples"
    for r in cand:
        assert len(r.ents) == 2
        for e in r.ents:
            assert entity_passes_filters(e), e
    again = search_ent_tuples(spark, pw.repartition(5), rels, cfg).collect()
    ka = sorted((r.rel, tuple(r.ents), round(r.min_logprob, 9)) for r in raw.collect())
    kb = sorted((r.rel, tuple(r.ents), round(r.min_logprob, 9)) for r in again)
    assert ka == kb


@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_full_harvest_realistic_tokenizers(spark, lm_name):
    """Whole pipeline — prompt weighting (PLL row plans on real-shaped
    tokenizers), beam, word cap, rescoring with casing variants."""
    from knowledge_harvest_from_lms_spark.plans.harvest import harvest

    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    cfg = HarvestConfig(
        max_n_ent_tuples=5, token_beam_width=4, max_ent_subwords=2,
        shuffle_partitions=8, lm=lm_name,
    )
    out = harvest(spark, rels, cfg)
    pw = out["prompt_weights"].collect()
    assert pw and abs(sum(r.weight for r in pw) - 1.0) < 1e-9
    triples = out["triples"].collect()
    assert triples
    ranks = sorted(r.rank for r in triples)
    assert ranks == list(range(1, len(ranks) + 1))
    # weights publish at round-9 (operators/rescoring.py), so the sum
    # carries up to n_triples * 5e-10 of rounding residue
    assert abs(sum(r.weight for r in triples) - 1.0) < 5e-7


def test_subword_entities_exercised_bpe(spark):
    """max_ent_subwords=2 with byte-BPE must produce at least one
    multi-piece entity (continuation pieces carry no punctuation in
    BPE, unlike WordPiece's ##, so they survive the reference char
    filter — exactly roberta's behavior)."""
    cfg = HarvestConfig(
        max_n_ent_tuples=8, token_beam_width=6, max_ent_subwords=2,
        shuffle_partitions=8, lm="fake-bpe", prune_slack=None,
    )
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    pw = spark.createDataFrame(
        [("AtLocation", "<ENT0> is located in <ENT1> .", 1.0)],
        "rel string, prompt string, weight double",
    )
    cand = finalize_candidates(search_ent_tuples(spark, pw, rels, cfg), cfg).collect()
    assert cand
    lm = FakeByteBPEMLM()
    multi = 0
    for r in cand:
        for e in r.ents:
            multi += len(lm._tok.encode(e, add_special_tokens=False)) > 1
    assert multi > 0


# ---------------------------------------------------------------------------
# property: pll_row_plan has DEFINED behavior on arbitrary input
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def slotted_prompts(draw):
    """Random 2-slot prompts with arbitrary glue (possibly empty /
    punctuation-glued, the misalignment-prone shapes) + entities."""
    word = st.text(alphabet="abcdefghijklmnop'", min_size=1, max_size=8)
    glue = st.text(alphabet="abcdefg ',.-", min_size=0, max_size=10)
    pre, mid, post = draw(glue), draw(glue), draw(glue)
    prompt = f"{pre}<ENT0>{mid} likes <ENT1>{post}"
    e0 = " ".join(draw(st.lists(word, min_size=1, max_size=2)))
    e1 = " ".join(draw(st.lists(word, min_size=1, max_size=2)))
    return prompt, [e0, e1]


@settings(max_examples=150, deadline=None)
@given(case=slotted_prompts())
def test_pll_row_plan_defined_behavior(case):
    """For ANY prompt/entity shape: either a valid plan (non-empty
    in-range mask positions) or PLLAlignmentError — never a raw
    TypeError/IndexError (the reference's failure mode,
    language_model_wrapper.py:107-115)."""
    prompt, ents = case
    for tok in (ByteBPEFakeTokenizer(), WordPieceFakeTokenizer()):
        try:
            ids, mp = pll_row_plan(tok, prompt, ents)
        except PLLAlignmentError:
            continue
        assert mp, (prompt, ents)
        assert all(0 < p < len(ids) for p in mp), (prompt, ents, mp)


@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_harvest_export_reload_eval_loop(spark, tmp_path, lm_name):
    """The COMPLETE artifact loop over realistic tokenizer structure:
    harvest → reference-layout JSON export (incl. summary.txt) →
    reload through the golden-artifact loaders → P/R@k == 1.0 against
    itself. This is the exact machinery the north rule's content
    comparison runs through, exercised end to end on byte-BPE and
    WordPiece structure without torch."""
    from knowledge_harvest_from_lms_spark.plans.evaluation import (
        load_golden_ent_tuples,
        precision_recall_at_k,
    )
    from knowledge_harvest_from_lms_spark.plans.harvest import harvest
    from knowledge_harvest_from_lms_spark.sources.results_json import (
        write_reference_results,
    )

    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    cfg = HarvestConfig(
        max_n_ent_tuples=5, token_beam_width=4, max_ent_subwords=2,
        shuffle_partitions=8, lm=lm_name,
    )
    out = harvest(spark, rels, cfg)
    out_dir = write_reference_results(
        out["prompt_weights"], out["triples"], str(tmp_path),
        rel_set="fixture", model_name=lm_name,
    )
    import os

    assert os.path.exists(os.path.join(out_dir, "summary.txt"))
    golden = load_golden_ent_tuples(spark, out_dir, ["AtLocation"])
    pr = precision_recall_at_k(out["triples"], golden, k=100).collect()
    assert len(pr) == 1
    assert pr[0].precision == 1.0 and pr[0].recall == 1.0


@pytest.mark.parametrize("lm_name", ["fake-bpe", "fake-wp"])
def test_spark_equals_sequential_spec_realistic(spark, lm_name):
    """EXACT spec equality over the realistic tokenizer families: the
    distributed pipeline must reproduce the deterministic sequential
    spec (tests/seq_spec.py) on byte-BPE and WordPiece structure —
    the same contract already proven for the stub, now over
    multi-piece/Ġ/## token dynamics."""
    import seq_spec

    from knowledge_harvest_from_lms_spark.plans.harvest import harvest
    from knowledge_harvest_from_lms_spark.sources.fixtures import FIXTURE_RELATIONS
    from knowledge_harvest_from_lms_spark.sources.relations import (
        relations_from_records,
    )

    cfg = HarvestConfig(
        max_n_ent_tuples=8, token_beam_width=5, max_ent_subwords=2,
        shuffle_partitions=8, lm=lm_name, prune_slack=None,
    )
    records = [r for r in FIXTURE_RELATIONS if r["rel"] == "AtLocation"]
    out = harvest(spark, relations_from_records(spark, records), cfg)
    got_triples = {}
    for r in out["triples"].collect():
        got_triples.setdefault(r.rel, []).append(
            (r.rank, tuple(r.ents), r.score, r.weight)
        )

    lm = resolve_lm(lm_name)
    pw = seq_spec.spec_prompt_weights(records, lm, cfg)
    fin = seq_spec.spec_finalize(seq_spec.spec_search(records, pw, lm, cfg), cfg)
    triples = seq_spec.spec_rescore(fin, pw, lm, cfg)

    for rel, expected in triples.items():
        rows = sorted(got_triples[rel])
        assert len(rows) == len(expected), rel
        for (rank, ents, score, weight), (e_ents, e_score, e_weight, e_rank) in zip(
            rows, expected
        ):
            assert rank == e_rank and ents == tuple(e_ents), (rel, rank, ents)
            assert score == pytest.approx(e_score, rel=1e-6)
            assert weight == pytest.approx(e_weight, rel=1e-6)


# ---------------------------------------------------------------------------
# property fuzz: pll_row_plan never silently mislocates a slot (r4,
# VERDICT r3 item 7) — for RANDOM prompts/entities across all three
# fake tokenizer families the outcome is either a plan whose mask span
# decodes back to the entity's first word, or a defined
# PLLAlignmentError. The r3 sweep covered the 562 real relations;
# this covers the space between.
# ---------------------------------------------------------------------------

from hypothesis import example, given, settings, strategies as st

from knowledge_harvest_from_lms_spark.lm.fake import get_cached_fake_lm
from knowledge_harvest_from_lms_spark.lm.fake_tokenizers import (
    get_cached_bpe_lm,
    get_cached_wp_lm,
)

_WORDS = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
_CASED = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    min_size=1, max_size=8,
)


@st.composite
def _prompt_and_ents(draw):
    n_slots = draw(st.integers(1, 3))
    glue = draw(st.sampled_from([" ", " ", " ", "", ", ", ". "]))
    parts = []
    for i in range(n_slots):
        lead = draw(st.lists(_WORDS, min_size=0, max_size=2))
        parts.extend(lead)
        # slot, optionally glued to surrounding punctuation/text
        suffix = draw(st.sampled_from(["", "", "'s", ",", "."]))
        parts.append(f"<ENT{i}>{suffix}")
        if glue != " " and draw(st.booleans()):
            parts[-1] = draw(_WORDS) + parts[-1]
    tail = draw(st.lists(_WORDS, min_size=0, max_size=2))
    prompt = " ".join(parts + tail) + " ."
    ents = tuple(
        " ".join(draw(st.lists(_CASED, min_size=1, max_size=2)))
        for _ in range(n_slots)
    )
    return prompt, ents


@settings(max_examples=250, deadline=None)
@given(_prompt_and_ents())
@example(
    pe=("<ENT0>'s <ENT1> .", ('A', 'A')),
).via('discovered failure')
def test_pll_row_plan_fuzz_all_tokenizer_families(pe):
    prompt, ents = pe
    backends = [
        get_cached_fake_lm(),
        get_cached_bpe_lm(),
        get_cached_wp_lm(),
    ]
    for lm in backends:
        tok = lm._tok
        try:
            input_ids, mask_positions = pll_row_plan(tok, prompt, list(ents))
        except PLLAlignmentError:
            continue  # defined, diagnosable outcome
        # a returned plan must be internally valid: in-range, distinct
        # positions, and the token IDS at each slot's mask span equal
        # that slot's independently-recomputed in-context first-word
        # encoding — never a silent wrong position. (Checking by id,
        # not decoded text: the fake tokenizers hash unseen pieces
        # into a bounded reserve vocab, so two pieces can share an id
        # and decode() is deliberately lossy there — a fuzz-found
        # artifact of the FAKES, not of pll_row_plan.)
        import string as _s

        from knowledge_harvest_from_lms_spark.functions.textops import get_sent

        assert all(0 <= p < len(input_ids) for p in mask_positions)
        assert len(mask_positions) == len(set(mask_positions))
        caps = list(ents)
        for i, e in enumerate(caps):
            if prompt.startswith(f"<ENT{i}>"):
                caps[i] = e.capitalize()
        sent = get_sent(prompt, caps)
        off = 0
        for i, e in enumerate(caps):
            # reference first-word recovery (language_model_wrapper.py)
            prefix = prompt[: prompt.find(f"<ENT{i}>")].strip()
            for j in range(len(caps)):
                prefix = prefix.replace(f"<ENT{j}>", caps[j])
            ent_in_sent = prompt[prompt.find(f"<ENT{i}>"):].split()[0]
            for punc in _s.punctuation:
                if punc not in "<>":
                    ent_in_sent = ent_in_sent.split(punc)[0]
            ent_in_sent = ent_in_sent.replace(f"<ENT{i}>", e).split()[0]
            prefixed = (
                f" {ent_in_sent}" if sent[len(prefix)] == " " else ent_in_sent
            )
            expect = list(tok.encode(prefixed, add_special_tokens=False))
            span = mask_positions[off: off + len(expect)]
            off += len(expect)
            assert [input_ids[p] for p in span] == expect, (
                f"slot {i} mask span ids diverge from the first-word "
                f"encoding (prompt={prompt!r}, ents={ents!r}, "
                f"tok={type(tok).__name__})"
            )
            assert span == sorted(span)
        assert off == len(mask_positions)
