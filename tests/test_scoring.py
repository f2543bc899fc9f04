"""Score-combiner / softmax kernels vs hand-computed reference values
(FIXTURES.md §6; reference models/knowledge_harvester.py:66-134)."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from knowledge_harvest_from_lms_spark.functions.scoring import (
    combine_mask_logprobs,
    prompt_compatibility,
    softmax,
    softmax_clip_renorm,
)


def test_combine_mask_logprobs_fixture():
    # logprobs [-1,-2,-3], 2 entities:
    # token_wise = -6/3 = -2 ; ent_wise = -6/2 = -3 ; min = -3
    # score = (-2 + -3 + -3)/3 = -8/3 (models/knowledge_harvester.py:126-134)
    assert combine_mask_logprobs([-1.0, -2.0, -3.0], n_ents=2) == pytest.approx(-8 / 3)


def test_combine_single():
    assert combine_mask_logprobs([-2.0], n_ents=1) == pytest.approx(-2.0)


def test_softmax_clip_renorm():
    # one entry normalizing under 0.05 is zeroed then renormalized
    # (models/knowledge_harvester.py:76-78)
    w = softmax_clip_renorm([3.0, 2.9, -5.0])
    assert w[2] == 0.0
    assert w.sum() == pytest.approx(1.0)
    assert w[0] > w[1] > 0


def test_softmax_matches_scipy_definition():
    x = np.array([0.1, 0.2, 0.3])
    e = np.exp(x - x.max())
    np.testing.assert_allclose(softmax(x), e / e.sum())


def test_prompt_compatibility():
    # (pos - 0.5*neg)/temp, temp=2 (main.py:12 prompt_temp=2.)
    assert prompt_compatibility(-1.0, -4.0, 2.0) == pytest.approx(0.5)


@given(st.lists(st.floats(-50, 50), min_size=1, max_size=30))
def test_softmax_clip_renorm_properties(ws):
    out = softmax_clip_renorm(ws)
    assert np.all(out >= 0)
    assert out.sum() == pytest.approx(1.0) or out.sum() == 0.0


@given(
    st.lists(st.floats(-30, 0), min_size=1, max_size=10),
    st.integers(1, 3),
)
def test_combine_is_monotone_in_min(lps, n_ents):
    # appending a lower logprob can only lower the combined score's min term
    base = combine_mask_logprobs(lps, n_ents)
    worse = combine_mask_logprobs(lps + [min(lps) - 1.0], n_ents)
    assert worse <= base + 1e-9
