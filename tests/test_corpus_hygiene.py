"""PII redaction + benchmark decontamination (q52/q53 carry the
oracle replays; these pin the properties the oracles can't)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.functions.pii import (
    pii_counts,
    redact_pii,
)
from knowledge_harvest_from_lms_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    word_ngrams,
)


def test_redact_pii_cases(spark):
    cases = [
        ("mail me at a.b+c@host.example.org now",
         "mail me at <EMAIL> now"),
        ("server 192.168.0.1 and 10.0.0.255 up",
         "server <IP> and <IP> up"),
        ("call +49 151 1234 5678 today", "call <PHONE> today"),
        # email wins before the phone pass can eat its digits
        ("x +4915112345678@h.example.de y", "x <EMAIL> y"),
        # version strings: no 4th octet -> not an IP; no +CC -> not a phone
        ("v1.2.3 released, build 123 456 789", "v1.2.3 released, build 123 456 789"),
        # review r4: letter/dot-preceded quads and >255 octets are NOT IPs
        ("release v10.2.3.4 and 2.14.1.300 notes", "release v10.2.3.4 and 2.14.1.300 notes"),
        # consecutive IPs both redact (leading boundary is CAPTURED, not consumed zero-width)
        ("pair 1.2.3.4 5.6.7.8 done", "pair <IP> <IP> done"),
        ("", ""),
    ]
    df = spark.createDataFrame([Row(t=a) for a, _ in cases])
    got = [r[0] for r in df.select(redact_pii(F.col("t"))).collect()]
    assert got == [want for _, want in cases]


def test_redact_pii_kinds_subset_and_counts(spark):
    df = spark.createDataFrame(
        [Row(t="a@b.example and 1.2.3.4 and +1 234 5678 90")]
    )
    only_email = df.select(
        redact_pii(F.col("t"), kinds=("email",)).alias("r")
    ).collect()[0]["r"]
    assert "<EMAIL>" in only_email and "1.2.3.4" in only_email
    with pytest.raises(ValueError, match="unknown pii kinds"):
        redact_pii(F.col("t"), kinds=("ssn",))
    counts = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("t")).items()]
    ).collect()[0]
    assert counts["email"] == 1 and counts["ipv4"] == 1 and counts["phone"] == 1


def test_pii_counts_no_double_count(spark):
    """One span, one kind (review r4): the digit run inside a +CC
    email local part is counted as email ONLY — counts agree with
    what redact_pii replaces."""
    df = spark.createDataFrame([Row(t="x +4915112345678@h.example.de y")])
    counts = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("t")).items()]
    ).collect()[0]
    assert counts["email"] == 1
    assert counts["phone"] == 0 and counts["ipv4"] == 0


def test_word_ngrams_short_doc(spark):
    df = spark.createDataFrame([Row(t="a b"), Row(t="a b c")])
    out = [r[0] for r in df.select(word_ngrams(F.col("t"), 3)).collect()]
    assert out[0] == []
    assert out[1] == ["a b c"]


def test_contamination_hash_equals_string_join(spark):
    """The xxhash64-keyed scale path flags exactly the same documents
    as the exact string join (no collisions at this size; the hash
    variant exists to keep a 10M-gram benchmark broadcastable)."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely unrelated text with other words"),
            Row(doc_id=3, text="a quick brown fox jumps again today"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(text="said the quick brown fox jumps and left")]
    )
    exact = {
        (r.doc_id, r.n_contaminated_grams)
        for r in contamination_hits(docs, bench, n=5, hash_grams=False).collect()
    }
    hashed = {
        (r.doc_id, r.n_contaminated_grams)
        for r in contamination_hits(docs, bench, n=5, hash_grams=True).collect()
    }
    assert exact == hashed
    assert {d for d, _ in exact} == {1}  # 5-gram overlap only in doc 1

    clean = decontaminate(docs, bench, n=5)
    assert {r.doc_id for r in clean.collect()} == {2, 3}


def test_contamination_counts_every_hit_gram(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d e f")])
    bench = spark.createDataFrame([Row(text="a b c d e f")])
    hits = contamination_hits(docs, bench, n=5, hash_grams=False).collect()
    # grams: "a b c d e", "b c d e f" -> both shared
    assert hits[0].n_contaminated_grams == 2


def test_boilerplate_removal_semantics(spark):
    """Host-frequency boilerplate: a line on >50% of a host's pages
    is stripped host-wide; content lines survive; in-page repetition
    can't fake frequency; other hosts keep the same string."""
    from knowledge_harvest_from_lms_spark.operators.boilerplate import (
        boilerplate_lines,
        remove_boilerplate_lines,
    )

    nav = "cookie banner"
    rows = [
        # host A: 3 pages, nav on all -> boilerplate
        Row(host="a", url=1, text=f"{nav}\ncontent one"),
        Row(host="a", url=2, text=f"{nav}\ncontent two"),
        Row(host="a", url=3, text=f"{nav}\ncontent three"),
        # host B: nav on 1 of 3 pages only -> NOT boilerplate there,
        # even repeated within the one page (countDistinct url)
        Row(host="b", url=4, text=f"{nav}\n{nav}\n{nav}\nbody"),
        Row(host="b", url=5, text="other body"),
        Row(host="b", url=6, text="third body"),
        # a page that is ALL boilerplate survives as an empty row
        Row(host="a", url=7, text=nav),
    ]
    pages = spark.createDataFrame(rows)
    bp = boilerplate_lines(pages, max_frac=0.5).collect()
    assert [(r.host, r.line) for r in bp] == [("a", nav)]
    out = {r.url: r for r in remove_boilerplate_lines(pages).collect()}
    assert out[1].text == "content one" and out[1].n_lines_kept == 1
    assert out[4].text == f"{nav}\n{nav}\n{nav}\nbody"  # host b untouched
    assert out[7].text == "" and out[7].n_lines_kept == 0  # row preserved
    assert len(out) == 7

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_frac"):
        boilerplate_lines(pages, max_frac=0.0)
