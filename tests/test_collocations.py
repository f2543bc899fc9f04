"""PMI collocations (operators/collocations.py): counts and PMI must
match a literal driver-side recount, the glued pair must win, and
min_count must drop rare-pair PMI spikes."""

import math
from collections import Counter

import pytest

from knowledge_harvest_from_lms_spark.operators.collocations import (
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _ref(texts, min_count):
    import re

    uni, bi, n_uni, n_bi = Counter(), Counter(), 0, 0
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        n_uni += len(toks)
        n_bi += max(len(toks) - 1, 0)
    out = {}
    for (a, b), c in bi.items():
        if c >= min_count:
            out[(a, b)] = round(
                math.log(
                    (c / n_bi) / ((uni[a] / n_uni) * (uni[b] / n_uni))
                ),
                9,
            )
    return out


def test_matches_reference_counts_and_pmi(spark):
    texts = [
        "new york is big",
        "new york has rain",
        "york new nothing",
        "big rain in new york",
        "the new york times",
        "a new day in york",
    ]
    rows = pmi_collocations(_docs(spark, texts), min_count=3, top_n=10).collect()
    ref = _ref(texts, min_count=3)
    got = {(r.w1, r.w2): r.pmi for r in rows}
    assert got == ref
    # the deliberately glued pair is the top collocation
    assert rows[0].w1 == "new" and rows[0].w2 == "york"


def test_min_count_prunes_rare_spikes(spark):
    # "qq zz" occurs once with unique words -> max PMI if admitted
    texts = ["qq zz"] + ["common words here"] * 5
    rows = pmi_collocations(_docs(spark, texts), min_count=2, top_n=10).collect()
    assert ("qq", "zz") not in {(r.w1, r.w2) for r in rows}


def test_single_token_docs_count_unigrams_only(spark):
    texts = ["solo", "solo", "pair up", "pair up"]
    rows = pmi_collocations(_docs(spark, texts), min_count=2, top_n=10).collect()
    ref = _ref(texts, min_count=2)
    assert {(r.w1, r.w2): r.pmi for r in rows} == ref


def test_bad_min_count(spark):
    with pytest.raises(ValueError):
        pmi_collocations(_docs(spark, ["a b"]), min_count=0)
