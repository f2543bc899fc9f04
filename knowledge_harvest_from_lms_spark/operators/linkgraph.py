"""Web link-graph construction — hrefs to a host-level edge list.

The web graph is the other graph a Common-Crawl-scale pipeline
materializes besides the knowledge graph: host-level link structure
drives crawl prioritization, spam/SEO-farm detection (see
operators/kcore.py, operators/triangles.py), and PageRank-weighted
corpus sampling (operators/graph.py pagerank + operators/sampling.py
weighted reservoir). This module owns the extraction step:

    pages(url, html) -> (src_url, dst_url) -> (src_host, dst_host, n)

Extraction contract (deliberately narrow and documented, mirroring
what a production extractor keeps after its own normalization pass):

* double-quoted ``href="..."`` attributes, case-insensitive;
* absolute ``http(s)://`` targets kept as-is;
* root-relative ``/path`` targets resolved against the source page's
  scheme://host;
* everything else (protocol-relative, fragment-only, ``mailto:``,
  ``javascript:``, relative-path) is DROPPED — resolving those needs
  a base-tag/URL-join micro-parser that earns its complexity only
  with real crawl data.

Plan shape: ``regexp_extract_all`` is a JVM projection fused into the
page scan (html never crosses to Python — the reason this is not a
Pandas UDF); one explode is row-linear in the number of anchors; the
host-pair aggregate collapses map-side, so hub hosts (every page on
wikipedia links its sibling hosts) become one partial per partition,
and the output is bounded by |hosts|^2 actually linked, not by pages.
Optionally canonicalize link urls first with
functions/urls.canonicalize_url (q49) — kept out of the default path
so the extraction contract stays independently testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (?i) — Java regex and RE2 (DuckDB) both honor the inline flag, so
# the DuckDB oracle (q86) replays the identical pattern string.
HREF_PATTERN = '(?i)href\\s*=\\s*"([^"]*)"'
# Anchor ELEMENT twin: href + inner text in one pattern, two capture
# groups. Contract is deliberately narrow like HREF_PATTERN's:
# double-quoted href, inner text free of nested tags ([^<]*) — the
# anchor-text signal a production extractor keeps after its own
# sanitization pass. Extracted twice (group 1, then group 2) so both
# engines zip the two arrays positionally.
ANCHOR_PATTERN = '(?i)<a\\s[^>]*href\\s*=\\s*"([^"]*)"[^>]*>([^<]*)</a>'
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"
_SCHEME_HOST_RE = "^([a-z][a-z0-9+.-]*://[^/:?#]+)"

# Navigation boilerplate that dominates raw anchor-text counts and
# carries zero naming signal — the standard web-KG stoplist shape
# (compare F4's entity stopwords). Applied AFTER normalization, so
# casing/whitespace variants of these are caught too.
GENERIC_ANCHORS = (
    "click here", "here", "read more", "more", "link", "this",
    "home", "next", "previous", "continue reading",
)


def url_host(url):
    """Lowercased host of an absolute url ('' when unparseable).
    Lowers BEFORE matching so 'HTTPS://Host3...' parses — scheme and
    host are case-insensitive per RFC 3986."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(src_url, dst_url)`` — one row per kept anchor, duplicates
    preserved (a page linking a target 3 times is signal, and the
    host aggregate wants the multiplicity). ``html_col`` may be
    binary (cast to string — the synth/web_pages convention) or
    already-decoded text."""
    html = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html, F.lit(HREF_PATTERN), 1)
    src = F.col(url_col)
    exploded = pages.select(
        src.alias("src_url"), F.explode(hrefs).alias("raw")
    )
    return (
        exploded.withColumn("dst_url", _resolve_dst())
        .filter(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url")
    )


def _resolve_dst():
    """Resolution contract shared by extract_links and
    extract_anchor_texts: absolute http(s) kept, root-relative
    resolved against src_url's scheme://host, everything else NULL.
    Reads columns ``raw`` and ``src_url``."""
    lower = F.lower(F.col("raw"))
    scheme_host = F.regexp_extract(F.col("src_url"), _SCHEME_HOST_RE, 1)
    return F.when(
        lower.startswith("http://") | lower.startswith("https://"),
        F.col("raw"),
    ).when(
        F.col("raw").startswith("/") & ~F.col("raw").startswith("//"),
        F.concat(scheme_host, F.col("raw")),
    )


def extract_anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(src_url, dst_url, anchor)`` — one row per kept anchor
    element, inner text NORMALIZED (whitespace collapsed, trimmed,
    lowercased — surface forms are casing-insensitive names) but NOT
    stoplist-filtered here; `anchor_surface_forms` owns that policy.

    Anchor text is the classic web-KG naming signal: the distribution
    of texts other pages use when linking a target is a surface-form
    dictionary for the entity behind that target (what the reference
    gets from its seed ent_tuples, a crawl gets from anchors — feeds
    operators/graph.py entity linking / canonicalization). Same plan
    shape as extract_links: two JVM regexp_extract_all projections
    (groups 1 and 2 of ANCHOR_PATTERN) zipped positionally, ONE
    explode; html never crosses to Python."""
    html = F.col(html_col).cast("string")
    src = F.col(url_col)
    arrs = pages.select(
        src.alias("src_url"),
        F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 1).alias("hs"),
        F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 2).alias("ts"),
    )
    exploded = arrs.select(
        "src_url",
        F.explode(F.arrays_zip(F.col("hs"), F.col("ts"))).alias("z"),
    ).select(
        "src_url",
        F.col("z.hs").alias("raw"),
        F.col("z.ts").alias("anchor_raw"),
    )
    norm = F.lower(
        F.trim(F.regexp_replace(F.col("anchor_raw"), "\\s+", " "))
    )
    return (
        exploded.withColumn("dst_url", _resolve_dst())
        .filter(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url", norm.alias("anchor"))
    )


def anchor_surface_forms(
    anchors: DataFrame, top_k: int = 3
) -> DataFrame:
    """Per-target surface-form dictionary:
    ``(dst_host, anchor, n_links, share, rnk)`` — the ``top_k`` most
    frequent non-generic anchor texts per destination host, with each
    form's share of that host's kept anchors. Deterministic rank
    tie-break (count desc, anchor asc).

    Scale shape: the corpus-sized input collapses FIRST through one
    map-side-combining (host, anchor) aggregate — boilerplate anchors
    on a hub host become one partial per partition. Share and top-k
    are then two windows over the SAME dst_host partitioning of the
    aggregated table (one Sort/Exchange, no second corpus scan, no
    join — a separate totals aggregate would re-derive `counted` from
    the raw anchors; measured as a duplicated scan in the plan). The
    window partition's row count is bounded by the host's distinct-
    anchor vocabulary (a language-sized constant), not its in-link
    count — so it can't be corpus-skewed."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    kept = anchors.filter(
        (F.col("anchor") != "") & ~F.col("anchor").isin(*GENERIC_ANCHORS)
    )
    counted = (
        kept.select(url_host(F.col("dst_url")).alias("dst_host"), "anchor")
        .filter(F.col("dst_host") != "")
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    host = Window.partitionBy("dst_host")
    w = host.orderBy(F.col("n_links").desc(), F.col("anchor"))
    return (
        counted.withColumn(
            "share",
            F.round(
                F.col("n_links") / F.sum("n_links").over(host).cast("double"),
                9,
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("dst_host", "anchor", "n_links", "share", "rnk")
    )


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_self: bool = True,
) -> DataFrame:
    """Aggregate url-level links to ``(src_host, dst_host, n_links)``.
    Self-host edges (intra-site navigation — typically >90% of all
    anchors and pure noise for inter-host analyses) drop by default;
    keep them for site-internal structure work."""
    g = links.select(
        url_host(F.col(src_col)).alias("src_host"),
        url_host(F.col(dst_col)).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_self:
        g = g.filter(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )
