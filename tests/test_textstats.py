"""Repetition quality filters + URL canonicalization — hand-computed
semantics checks (the sf-scale versions are oracle-checked via
q48/q49 in test_oracle_parity)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.functions.urls import canonicalize_url
from knowledge_harvest_from_lms_spark.operators.textstats import (
    line_repetition_columns,
    ngram_repetition_stats,
)


def test_line_repetition_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 4 non-blank lines (blank + whitespace-only excluded),
            # "x" occurs twice -> 2 dup positions of 4; chars 2 of 4
            Row(doc_id=0, text="x\ny\nx\n  \n\nz"),
            # no duplicates
            Row(doc_id=1, text="aa\nbb"),
            # all duplicates, longer lines
            Row(doc_id=2, text="abc\nabc\nabc"),
            # blank-only text -> guarded zeros, no NaN/div-by-zero
            Row(doc_id=3, text="\n \n"),
        ]
    )
    rows = {
        r["doc_id"]: r
        for r in line_repetition_columns(df).collect()
    }
    assert rows[0]["dup_line_frac"] == 0.5
    assert rows[0]["dup_line_char_frac"] == 0.5
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["dup_line_char_frac"] == 0.0
    assert rows[2]["dup_line_frac"] == 1.0
    assert rows[2]["dup_line_char_frac"] == 1.0
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[3]["dup_line_char_frac"] == 0.0


def test_ngram_repetition_hand_computed(spark):
    # "a b a b c": 9 chars, 5 tokens, 5 non-space chars
    #   2-grams: "a b" x2, "b a", "b c" -> 4 positions, top cnt 2,
    #     top gram non-space chars 2 -> top_char_frac 2*2/5 = 0.8,
    #     dup positions 2/4 = 0.5
    #   3-grams: "a b a", "b a b", "a b c" -> all unique
    df = spark.createDataFrame([Row(doc_id=0, text="a b a b c")])
    out = {
        (r["doc_id"], r["n"]): r
        for r in ngram_repetition_stats(df, ns=(2, 3)).collect()
    }
    g2 = out[(0, 2)]
    assert g2["n_grams"] == 4
    assert g2["top_gram"] == "a b"
    assert g2["top_gram_count"] == 2
    assert g2["top_char_frac"] == 0.8
    assert g2["dup_gram_frac"] == 0.5
    g3 = out[(0, 3)]
    assert g3["n_grams"] == 3
    assert g3["top_gram_count"] == 1
    assert g3["dup_gram_frac"] == 0.0


def test_ngram_repetition_short_and_ties(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="solo"),  # 1 token: no 2-gram row
            # tie at cnt=1 between "a b" and "b z": lexicographically
            # greatest gram wins (matches the oracle's ORDER BY)
            Row(doc_id=1, text="a b z"),
            # overlap can push top_char_frac past 1.0 (documented)
            Row(doc_id=2, text="a a a a"),
        ]
    )
    out = ngram_repetition_stats(df, ns=(2,)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 0 not in by_id
    assert by_id[1]["top_gram"] == "b z"
    # doc 2: 3 positions of "a a", 2 non-space gram chars, 4 doc chars
    assert by_id[2]["top_char_frac"] == 1.5
    assert by_id[2]["dup_gram_frac"] == 1.0


def test_canonicalize_url_cases(spark):
    cases = [
        # scheme+host lowered, default port dropped, fragment dropped
        ("HTTPS://WWW.Example.COM:443/A/B#frag", "https://www.example.com/A/B"),
        # http default port; path case preserved
        ("HTTP://h.example:80/Path", "http://h.example/Path"),
        # non-default port survives
        ("https://h.example:8443/x", "https://h.example:8443/x"),
        # tracking params dropped, rest sorted; emptied query drops '?'
        (
            "https://h.example/p?utm_source=a&b=2&a=1&gclid=z",
            "https://h.example/p?a=1&b=2",
        ),
        ("https://h.example/p?utm_campaign=x&fbclid=y", "https://h.example/p"),
        # empty path -> "/"
        ("https://h.example?z=1&a=2", "https://h.example/?a=2&z=1"),
        ("https://h.example", "https://h.example/"),
        # query value case preserved; param ORDER normalized only
        ("https://h.example/p?B=UPPER&a=x", "https://h.example/p?B=UPPER&a=x"),
    ]
    df = spark.createDataFrame([Row(url=u) for u, _ in cases])
    got = [
        r[0]
        for r in df.select(canonicalize_url(F.col("url"))).collect()
    ]
    assert got == [want for _, want in cases]


def test_canonicalize_url_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over randomly
    structured messy URLs — a canonical KEY must be a fixed point, or
    repeated normalization (e.g. re-ingesting already-clean tables)
    would split dedup groups."""
    import random

    rng = random.Random(13)
    schemes = ["http://", "https://", "HTTP://", "HTTPS://"]
    hosts = ["Example.COM", "a.b.example", "X-Y.example", "example.com"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p%20q", "/trailing/"]
    queries = [
        "", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&utm_medium=m&b=2",
        "?gclid=G&z=Z", "?B=UP&a=low", "?dup=1&dup=2",
    ]
    frags = ["", "#f", "#Sec tion"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    once = canonicalize_url(F.col("url")).alias("c1")
    out = df.select(F.col("url"), once).select(
        "url", "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, f"non-idempotent: {[(r.url, r.c1, r.c2) for r in bad[:5]]}"


def test_canonicalize_url_hostile_inputs_total(spark):
    """The canonicalizer is TOTAL on junk input — a 100 TB crawl
    contains every malformed spelling imaginable, and a null/crash in
    a scan-fused projection kills the whole stage. Schemeless inputs
    pass through (with query-param normalization only); nothing
    yields null."""
    cases = [
        ("", "/"),
        ("not a url", "not a url"),
        ("no-scheme/path?b=2&a=1#f", "no-scheme/path?a=1&b=2"),
        ("ftp://Host/X", "ftp://host/X"),  # non-http scheme: lowered, port rules don't apply
        ("https://", "https:///"),
        ("https://h.example/p?", "https://h.example/p"),
        ("https://h.example/p?&&", "https://h.example/p"),
        ("https://h.example:443", "https://h.example/"),
        ("https://h/p#a#b", "https://h/p"),
        ("  https://h/p", "  https://h/p"),  # leading junk: no authority match, passthrough
    ]
    df = spark.createDataFrame([Row(url=u) for u, _ in cases])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]
    assert all(g is not None for g in got)


def test_ngram_repetition_hostile_docs_total(spark):
    """Whitespace-only and NULL texts must not kill the stage (review
    r4): tchars==0 emits 0.0 fractions, None behaves as empty."""
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=" "),      # 2 empty tokens, tchars=0
            Row(doc_id=1, text="  "),     # 3 empty tokens, tchars=0
            Row(doc_id=2, text=None),     # NULL
            Row(doc_id=3, text="a b a"),  # control
        ]
    )
    rows = {
        (r["doc_id"], r["n"]): r
        for r in ngram_repetition_stats(df, ns=(2,)).collect()
    }
    # whitespace-only docs DO have 2-gram positions (empty tokens) but
    # zero char mass -> defined 0.0, not a crash
    assert rows[(0, 2)]["top_char_frac"] == 0.0
    assert rows[(1, 2)]["top_char_frac"] == 0.0
    assert (2, 2) not in rows  # NULL -> empty -> 1 token -> no row
    # "a b" and "b a" tie at cnt 1 -> lexicographically greatest wins
    assert rows[(3, 2)]["top_gram"] == "b a"


def test_paragraph_repetition_hand_computed(spark):
    from knowledge_harvest_from_lms_spark.operators.textstats import (
        paragraph_repetition_columns,
    )

    df = spark.createDataFrame(
        [
            # paragraphs: ["a b\nc", "a b\nc", "d"] (5+5+1 chars) ->
            # 2 dup of 3 positions; 10 of 11 chars
            Row(doc_id=0, text="a b\nc\n\na b\nc\n\nd"),
            Row(doc_id=1, text="solo paragraph"),
        ]
    )
    rows = {r["doc_id"]: r for r in paragraph_repetition_columns(df).collect()}
    assert rows[0]["dup_para_frac"] == 0.6667
    assert rows[0]["dup_para_char_frac"] == 0.9091
    assert rows[1]["dup_para_frac"] == 0.0
