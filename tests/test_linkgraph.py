"""Link extraction + host graph (operators/linkgraph.py): the
extraction contract (kept/resolved/dropped classes), multiplicity,
binary html, and self-edge handling."""

from pyspark.sql import functions as F

from knowledge_harvest_from_lms_spark.operators.linkgraph import (
    extract_links,
    host_graph,
    url_host,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


SRC = "https://src.example.com/page/1"


def _links(spark, html):
    df = _pages(spark, [(SRC, html)])
    return [r.dst_url for r in extract_links(df).collect()]


def test_absolute_kept_verbatim(spark):
    assert _links(spark, '<a href="https://a.com/x?q=1">t</a>') == [
        "https://a.com/x?q=1"
    ]


def test_mixed_case_attr_and_scheme_kept(spark):
    assert _links(spark, '<A HREF="HTTPS://A.com/X">t</A>') == [
        "HTTPS://A.com/X"
    ]


def test_root_relative_resolved_against_source(spark):
    assert _links(spark, '<a href="/sub/page">t</a>') == [
        "https://src.example.com/sub/page"
    ]


def test_dropped_classes(spark):
    html = (
        '<a href="//proto.rel/x">a</a>'
        '<a href="mailto:x@y.z">b</a>'
        '<a href="javascript:void(0)">c</a>'
        '<a href="relative/path">d</a>'
        '<a href="#frag">e</a>'
        "<a href='single.quoted'>f</a>"
    )
    assert _links(spark, html) == []


def test_multiplicity_preserved(spark):
    html = '<a href="https://a.com/">x</a><a href="https://a.com/">y</a>'
    assert _links(spark, html) == ["https://a.com/", "https://a.com/"]


def test_binary_html_casts(spark):
    df = spark.createDataFrame(
        [(SRC, bytearray(b'<a href="https://a.com/">x</a>'))],
        "url string, html binary",
    )
    assert [r.dst_url for r in extract_links(df).collect()] == [
        "https://a.com/"
    ]


def test_host_graph_counts_and_self_edges(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://B.com/y"),  # host case-folds
            ("https://a.com/3", "https://a.com/inner"),  # self
            ("https://a.com/4", "not-a-url"),  # unparseable dst
        ],
        "src_url string, dst_url string",
    )
    out = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(links).collect()
    }
    assert out == {("a.com", "b.com"): 2}
    kept = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(links, drop_self=False).collect()
    }
    assert kept == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1}


def test_url_host_parses_ports_and_paths(spark):
    df = spark.createDataFrame(
        [
            ("https://A.com:8443/p?q#f",),
            ("HTTP://b.org",),
            ("garbage",),
        ],
        "u string",
    )
    out = [r[0] for r in df.select(url_host(F.col("u"))).collect()]
    assert out == ["a.com", "b.org", ""]


# ---------------------------------------------------------------------------
# Anchor-text surface forms
# ---------------------------------------------------------------------------

from knowledge_harvest_from_lms_spark.operators.linkgraph import (  # noqa: E402
    anchor_surface_forms,
    extract_anchor_texts,
)


def _anchors(spark, html, url=SRC):
    df = _pages(spark, [(url, html)])
    return [
        (r.dst_url, r.anchor)
        for r in extract_anchor_texts(df)
        .orderBy("dst_url", "anchor")
        .collect()
    ]


def test_anchor_text_extracted_with_attribute_noise(spark):
    got = _anchors(
        spark,
        '<a class="nav" href="https://a.com/x" rel="nofollow">Acme Corp</a>',
    )
    assert got == [("https://a.com/x", "acme corp")]


def test_anchor_text_normalized_whitespace_and_case(spark):
    got = _anchors(
        spark, '<A HREF="https://a.com/x">  AcMe \t  CORP </A>'
    )
    assert got == [("https://a.com/x", "acme corp")]


def test_anchor_href_resolution_matches_extract_links(spark):
    html = (
        '<a href="/rel/p">t1</a>'
        '<a href="mailto:x@y.z">t2</a>'
        '<a href="https://b.com/q">t3</a>'
    )
    got = _anchors(spark, html)
    assert got == [
        ("https://b.com/q", "t3"),
        ("https://src.example.com/rel/p", "t1"),
    ]


def test_anchor_arrays_zip_keeps_pairing_in_order(spark):
    html = (
        '<a href="https://a.com/1">one</a>'
        '<a href="https://a.com/2">two</a>'
        '<a href="https://a.com/3">three</a>'
    )
    df = _pages(spark, [(SRC, html)])
    got = [
        (r.dst_url, r.anchor) for r in extract_anchor_texts(df).collect()
    ]
    assert got == [
        ("https://a.com/1", "one"),
        ("https://a.com/2", "two"),
        ("https://a.com/3", "three"),
    ]


def test_surface_forms_topk_share_and_generic_filter(spark):
    rows = (
        [("s", "https://t.com/x", "acme corp")] * 3
        + [("s", "https://t.com/y", "acme")] * 2
        + [("s", "https://t.com/z", "acme inc")] * 2
        + [("s", "https://t.com/w", "click here")] * 10  # stoplisted
        + [("s", "https://t.com/v", "")]  # empty dropped
        + [("s", "https://u.org/a", "zeta")]
    )
    anchors = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string"
    )
    out = {
        (r.dst_host, r.anchor): (r.n_links, r.share, r.rnk)
        for r in anchor_surface_forms(anchors, top_k=2).collect()
    }
    # t.com kept anchors total 7; 'acme' beats 'acme inc' on the
    # alphabetical tie-break at n=2; 'click here' never appears
    assert out == {
        ("t.com", "acme corp"): (3, round(3 / 7, 9), 1),
        ("t.com", "acme"): (2, round(2 / 7, 9), 2),
        ("u.org", "zeta"): (1, 1.0, 1),
    }


def test_surface_forms_arg_validation(spark):
    anchors = spark.createDataFrame(
        [("s", "https://t.com/x", "a")],
        "src_url string, dst_url string, anchor string",
    )
    import pytest

    with pytest.raises(ValueError):
        anchor_surface_forms(anchors, top_k=0)
