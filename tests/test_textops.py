"""Unit tests for the pure prompt/slot kernels, pinned to reference
semantics (FIXTURES.md §6; citations are reference file:line)."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from knowledge_harvest_from_lms_spark.functions.textops import (
    casing_variants,
    entity_conflicts_with_tuple,
    entity_in_any_prompt,
    entity_passes_filters,
    find_sublist,
    fix_prompt_style,
    get_mask_place,
    get_masked_prompt,
    get_n_ents,
    get_n_masks,
    get_sent,
    is_valid_prompt,
    token_text_allowed,
)


def test_get_n_ents():
    # data_utils/data_utils.py:24-28
    assert get_n_ents("<ENT0> can <ENT1> in <ENT2> .") == 3
    assert get_n_ents("no slots here .") == 0
    assert get_n_ents("<ENT1> only") == 0  # counting stops at missing <ENT0>
    assert get_n_ents("<ENT0>s can <ENT1> .") == 2


def test_get_sent():
    assert (
        get_sent("<ENT1> is the location for <ENT0> .", ["gear", "car"])
        == "car is the location for gear ."
    )


def test_is_valid_prompt():
    # data_utils/data_utils.py:16-21: '<ENT' must follow space or "
    assert is_valid_prompt("<ENT0> can <ENT1> .")
    assert is_valid_prompt('say "<ENT0>" loud .')
    assert not is_valid_prompt("a<ENT0> b")
    assert not is_valid_prompt("x.<ENT1> thing <ENT0>")
    assert is_valid_prompt("<ENT0> starts the prompt")


def test_fix_prompt_style():
    # data_utils/data_utils.py:68-73
    assert fix_prompt_style("  x is y .") == "X is y ."
    assert fix_prompt_style("dogs can bark") == "Dogs can bark ."
    assert fix_prompt_style("<ENT0> can <ENT1>") == "<ENT0> can <ENT1> ."


def test_mask_math():
    # data_utils/data_utils.py:39-65, max_ent_subwords=2
    assert get_n_masks(t=0, n_ents=2, max_ent_subwords=2) == [1, 1]
    assert get_n_masks(t=1, n_ents=2, max_ent_subwords=2) == [2, 1]
    assert get_n_masks(t=2, n_ents=2, max_ent_subwords=2) == [1, 2]
    assert get_n_masks(t=3, n_ents=2, max_ent_subwords=2) == [2, 2]

    p = "<ENT1> is the location for <ENT0> ."
    # textual order is ENT1 then ENT0: ENT1's masks start at 0,
    # ENT0's start after ENT1's n_masks.
    assert get_mask_place(ent_idx=1, n_masks=[1, 2], prompt=p) == 0
    assert get_mask_place(ent_idx=0, n_masks=[1, 2], prompt=p) == 2

    assert (
        get_masked_prompt("<ENT0> can <ENT1> .", [2, 1], "<mask>")
        == "<mask><mask> can <mask> ."
    )


def test_find_sublist():
    assert find_sublist([1, 2, 3, 4], [2, 3]) == 1
    assert find_sublist([1, 2], [3]) is None
    assert find_sublist([1, 2], [1, 2]) == 0


def test_entity_filters():
    # models/entity_tuple_searcher.py:133-152 (FIXTURES.md §6)
    assert not entity_passes_filters("the cat")  # stopword word
    assert not entity_passes_filters("ab")  # <=2 chars
    assert not entity_passes_filters("a bc")  # single-char word
    assert not entity_passes_filters("ab cd")  # all words <=2 chars
    assert not entity_passes_filters("word word")  # repeat
    assert entity_passes_filters("solar system")
    assert entity_passes_filters("dog")


def test_entity_tuple_conflicts():
    # models/entity_tuple_searcher.py:154-162
    assert entity_conflicts_with_tuple("grass land", ["grassland"])
    assert entity_conflicts_with_tuple("play", ["playing"])
    assert entity_conflicts_with_tuple("playing", ["play"])
    assert not entity_conflicts_with_tuple("dog", ["cat"])


def test_entity_in_prompt():
    # models/entity_tuple_searcher.py:164-167
    assert entity_in_any_prompt("location", ["<ENT1> is the location for <ENT0> ."])
    assert not entity_in_any_prompt("dog", ["<ENT0> can <ENT1> ."])


def test_token_text_allowed():
    # models/entity_tuple_searcher.py:212-217
    assert token_text_allowed("dog")
    assert not token_text_allowed("123")
    assert not token_text_allowed("don't")
    assert not token_text_allowed("...")


def test_casing_variants():
    # models/knowledge_harvester.py:96-102 (FIXTURES.md §6)
    vs = casing_variants(["dog", "fetch"])
    assert len(vs) == 4
    assert vs[0] == ["dog", "fetch"]
    assert vs[1] == ["dog", "Fetch"]
    assert vs[2] == ["Dog", "fetch"]
    assert vs[3] == ["Dog", "Fetch"]


@given(st.lists(st.integers(0, 9), max_size=8), st.lists(st.integers(0, 9), min_size=1, max_size=3))
def test_find_sublist_property(a, b):
    idx = find_sublist(a, b)
    if idx is not None:
        assert a[idx : idx + len(b)] == b


@given(st.integers(0, 63))
def test_n_masks_roundtrip(t):
    # mixed-radix decode: sum of digit*base^i reconstructs t
    n_masks = get_n_masks(t=t, n_ents=6, max_ent_subwords=2)
    assert all(1 <= m <= 2 for m in n_masks)
    recon = sum((m - 1) * (2**i) for i, m in enumerate(n_masks))
    assert recon == t


@given(st.text(alphabet=" abc<ENT01>\"", max_size=30))
def test_is_valid_prompt_never_crashes(p):
    is_valid_prompt(p)
