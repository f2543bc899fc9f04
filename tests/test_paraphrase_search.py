"""S10/C9 — prompt paraphrase search with an injected deterministic
paraphraser: slot recovery via the reference's transformation tables
(byte-exact fixtures), the fuzz-dedup accept loop, and the relation
write-back round trip."""

from knowledge_harvest_from_lms_spark.functions.paraphrase import (
    first_sentence,
    fuzz_ratio,
    get_paraphrase_prompt,
    recover_slots,
    search_prompts,
)
from knowledge_harvest_from_lms_spark.plans.prompt_search import (
    search_prompts_for_relations,
    searched_prompts_table,
)
from knowledge_harvest_from_lms_spark.sources.relations import fixture_relations


# ---- slot recovery kernels (reference search_prompts.py:33-48) ----------

def test_recover_slots_direct():
    assert (
        recover_slots("giraffe lives in africa", ["giraffe", "africa"])
        == "<ENT0> lives in <ENT1>"
    )


def test_recover_slots_article_transformation():
    # 'a giraffe' — the entity matches only after the sentence-level
    # ['a ', ''] transform is NOT needed (direct substring hit), but
    # 'the ' stripping is needed when the article glues to the entity
    assert (
        recover_slots("you can find the giraffe in africa", ["the giraffe", "africa"])
        == "you can find <ENT0> in <ENT1>"
    )


def test_recover_slots_ing_transformation():
    # 'reading' appears as 'read' → ['ing', ''] entity transform
    assert (
        recover_slots("people visit a library to read", ["library", "reading"])
        == "people visit a <ENT0> to <ENT1>"
    )


def test_recover_slots_being_transformation():
    # 'being useful' appears as 'is useful' → ['being', 'is']
    assert (
        recover_slots("a knife is useful", ["knife", "being useful"])
        == "a <ENT0> <ENT1>"
    )


def test_recover_slots_ambiguous_returns_none():
    # entity occurs twice → cannot pin the slot
    assert recover_slots("water under water", ["water"]) is None
    # entity absent under every transformation
    assert recover_slots("totally unrelated text", ["giraffe"]) is None


def test_first_sentence_and_fuzz():
    assert first_sentence("First here. Second there.") == "First here."
    assert first_sentence("only one") == "only one"
    assert fuzz_ratio("abc", "abc") == 100
    assert fuzz_ratio("abc", "xyz") == 0
    assert 0 < fuzz_ratio("giraffe lives in africa", "giraffes live in africa") < 100


def test_get_paraphrase_prompt_retries():
    calls = []

    def flaky(sent):
        calls.append(sent)
        if len(calls) < 3:
            return "no entities here at all."
        return f"Certainly {sent}."

    out = get_paraphrase_prompt(flaky, "<ENT0> is located in <ENT1> .", ["paris", "france"])
    # trailing space is reference parity: .strip('.') keeps the space
    # that preceded the sentence period (search_prompts.py:26);
    # fix_prompt_style trims it at accept time
    assert out == "certainly <ENT0> is located in <ENT1> "
    assert len(calls) == 3
    assert all(c == calls[0] for c in calls)  # retries re-paraphrase the SAME sentence


# ---- accept/dedup loop (reference search_prompts.py:54-106) -------------

def _fake_paraphraser(sent: str) -> str:
    """Deterministic 'LLM': cycles through rewrite templates keyed by a
    stable hash of the sentence; entities are preserved verbatim so
    slot recovery succeeds."""
    templates = [
        "it is known that {s}",
        "commonly, {s}",
        "as everyone agrees, {s}",
        "observers report that {s}",
        "in many cases {s} indeed",
    ]
    k = sum(ord(c) for c in sent) % len(templates)
    return templates[k].format(s=sent) + "."


def test_search_prompts_accept_loop():
    init = ["<ENT0> is located in <ENT1> ."]
    seeds = [["paris", "france"], ["tokyo", "japan"], ["berlin", "germany"]]
    prompts = search_prompts(init, seeds, _fake_paraphraser, similarity_threshold=75)
    assert prompts, "deterministic paraphraser must yield prompts"
    for p in prompts:
        assert p.count("<ENT0>") == 1 and p.count("<ENT1>") == 1
        assert p.endswith(" .")  # fix_prompt_style applied
        assert p not in init
    # dedup: every accepted pair was below the fuzz threshold at accept
    # time. fix_prompt_style ran after acceptance (first-char case +
    # ' .' suffix), so invert it and allow a small margin for the
    # trailing-space characters it also strips.
    def unfix(p: str) -> str:
        q = p.rstrip(" .")
        return (q[0].lower() + q[1:]) if q else q

    for i, a in enumerate(prompts):
        for b in prompts[i + 1:]:
            assert fuzz_ratio(unfix(a), unfix(b)) < 80, (a, b)


def test_search_prompts_threshold_rejects_near_dups():
    init = ["<ENT0> can <ENT1> ."]
    seeds = [["bird", "fly"]]

    def near_identical(sent):
        return f"surely {sent}."

    # one paraphrase shape only → after the first accept, every further
    # candidate is identical (cache) → loop terminates with 1 prompt
    prompts = search_prompts(init, seeds, near_identical, similarity_threshold=75)
    assert len(prompts) == 1
    assert prompts[0] == "Surely <ENT0> can <ENT1> ."


# ---- job wrapper + write-back -------------------------------------------

def test_search_prompts_for_relations(spark):
    rels = fixture_relations(spark).withColumn(
        "prompts", __import__("pyspark").sql.functions.array().cast("array<string>")
    )
    after = search_prompts_for_relations(rels, _fake_paraphraser)
    got = {r.rel: list(r.prompts) for r in after.collect()}
    assert set(got) == {r.rel for r in rels.collect()}
    assert any(ps for ps in got.values()), "at least one relation gains prompts"
    new = searched_prompts_table(rels, after)
    new_rows = {(r.rel, r.prompt) for r in new.collect()}
    for rel, ps in got.items():
        for p in ps:
            assert (rel, p) in new_rows


# ---------------------------------------------------------------------------
# OpenAI-compatible client adapter (S10 production wiring; mocked — no
# network in CI)
# ---------------------------------------------------------------------------

def test_openai_adapter_request_shaping(monkeypatch):
    from knowledge_harvest_from_lms_spark.functions.paraphrase_client import (
        make_openai_paraphrase_fn,
    )

    seen = {}

    def transport(url, payload, api_key, timeout):
        seen.update(url=url, payload=payload, api_key=api_key, timeout=timeout)
        return {"choices": [{"text": " A dog lives in a house. And more."}]}

    fn = make_openai_paraphrase_fn(
        api_base="https://llm.example/v1/", api_key="sk-test",
        model="m-test", transport=transport,
    )
    out = fn("a dog is in a house")
    assert out == " A dog lives in a house. And more."
    assert seen["url"] == "https://llm.example/v1/completions"
    assert seen["api_key"] == "sk-test"
    # reference request shape (models/gpt3.py:9-28, search_prompts.py:23)
    p = seen["payload"]
    assert p["prompt"] == "paraphrase:\na dog is in a house\n"
    assert p["model"] == "m-test"
    assert (p["temperature"], p["max_tokens"], p["top_p"], p["n"]) == (1.0, 30, 1.0, 1)
    assert (p["frequency_penalty"], p["presence_penalty"]) == (0, 0)


def test_openai_adapter_env_gate(monkeypatch):
    from knowledge_harvest_from_lms_spark.functions import paraphrase_client as pc

    for var in ("PARAPHRASE_API_BASE", "PARAPHRASE_API_KEY", "OPENAI_API_KEY"):
        monkeypatch.delenv(var, raising=False)
    assert pc.paraphrase_fn_from_env() is None
    # a bare ambient OPENAI_API_KEY (common on dev machines) is NOT an
    # opt-in — offline/CI runs must never construct a live client from
    # it alone (ADVICE r3)
    monkeypatch.setenv("OPENAI_API_KEY", "sk-ambient")
    assert pc.paraphrase_fn_from_env() is None
    monkeypatch.setenv("PARAPHRASE_API_KEY", "sk-x")
    assert pc.paraphrase_fn_from_env() is not None


def test_openai_adapter_drives_search_prompts():
    """The adapter plugs into the real accept/dedup loop: a canned
    endpoint (transport fake) yields paraphrases that the loop recovers
    and accepts."""
    from knowledge_harvest_from_lms_spark.functions.paraphrase import search_prompts
    from knowledge_harvest_from_lms_spark.functions.paraphrase_client import (
        make_openai_paraphrase_fn,
    )

    responses = {
        "dog is in house": "dog lives in house.",
        "cat is in garden": "cat lives in garden.",
    }

    def transport(url, payload, api_key, timeout):
        sent = payload["prompt"].split("\n")[1]
        return {"choices": [{"text": responses.get(sent, sent)}]}

    fn = make_openai_paraphrase_fn(api_base="x://y", api_key="k", transport=transport)
    prompts = search_prompts(
        ["<ENT0> is in <ENT1>"],
        [["dog", "house"], ["cat", "garden"]],
        paraphrase_fn=fn,
    )
    assert "<ENT0> lives in <ENT1> ." in prompts
