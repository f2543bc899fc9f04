"""Property-based coverage (SURVEY.md §5.6): beam monotonicity and
skew-balance of salted aggregation."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.functions.scoring import combine_mask_logprobs
from knowledge_harvest_from_lms_spark.lm import build_stub_lm


@given(
    st.lists(st.floats(-20, -0.1), min_size=1, max_size=6),
    st.floats(-20, -0.1),
)
def test_beam_score_monotone_in_extension(lps, extra):
    """A tuple's beam score is min() over logprobs — extending a tuple
    can never raise it (underwrites the prune_slack rewrite)."""
    assert min(lps + [extra]) <= min(lps)


@settings(deadline=None, max_examples=20)
@given(st.integers(0, 10_000))
def test_stub_lm_logits_deterministic(i):
    lm = build_stub_lm()
    t = f"<mask> is in context {i % 7} ."
    a = lm.mask_logits(t)
    b = lm.mask_logits(t)
    np.testing.assert_array_equal(a, b)


def test_salted_agg_balances_hot_key(spark):
    """A 100:1 hot key must not put its whole group through one partial
    group — the salted pre-aggregation spreads it."""
    n = 20_000
    df = (
        spark.range(n, numPartitions=16)
        .withColumn(
            "word",
            F.when(F.col("id") % 2 == 0, F.lit("hotkey")).otherwise(
                F.concat(F.lit("w"), (F.col("id") % 500).cast("string"))
            ),
        )
    )
    salted = df.withColumn("salt", F.pmod(F.spark_partition_id(), F.lit(16)))
    partial = salted.groupBy("word", "salt").agg(F.count(F.lit(1)).alias("c"))
    # the hot key is split into ~16 partial groups
    hot_parts = partial.filter(F.col("word") == "hotkey").count()
    assert hot_parts >= 8
    # and the final result equals the plain aggregation
    final = partial.groupBy("word").agg(F.sum("c").alias("cnt"))
    plain = df.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    diff = final.join(plain, "word").filter(
        final["cnt"] != plain["cnt"]
    )
    assert diff.count() == 0


# ---- paraphrase slot-recovery properties (C9) -----------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TMPL_WORDS = st.lists(
    st.sampled_from(["relates", "to", "near", "within", "holds", "under"]),
    min_size=1, max_size=3,
)
_ENTS = st.lists(
    st.sampled_from(["qqfox", "zzbird", "kkfish", "jjwolf", "xxdeer"]),
    min_size=1, max_size=3, unique=True,
)


@settings(max_examples=60, deadline=None)
@given(mid=_TMPL_WORDS, ents=_ENTS)
def test_recover_slots_round_trip(mid, ents):
    """recover_slots inverts get_sent whenever each entity occurs
    exactly once: filling a slotted prompt and recovering slots from
    the (lowercased) sentence returns the original prompt."""
    from knowledge_harvest_from_lms_spark.functions.paraphrase import recover_slots
    from knowledge_harvest_from_lms_spark.functions.textops import get_sent

    slots = [f"<ENT{i}>" for i in range(len(ents))]
    prompt = (" " + " ".join(mid) + " ").join(slots)
    sent = get_sent(prompt, list(ents)).lower()
    assert recover_slots(sent, ents) == prompt


@settings(max_examples=60, deadline=None)
@given(a=st.text(max_size=24), b=st.text(max_size=24))
def test_fuzz_ratio_properties(a, b):
    from knowledge_harvest_from_lms_spark.functions.paraphrase import fuzz_ratio

    r = fuzz_ratio(a, b)
    assert 0 <= r <= 100
    assert r == fuzz_ratio(b, a)
    if a == b:
        assert r == 100
