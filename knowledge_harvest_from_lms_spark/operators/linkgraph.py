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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?i) — Java regex and RE2 (DuckDB) both honor the inline flag, so
# the DuckDB oracle (q86) replays the identical pattern string.
HREF_PATTERN = '(?i)href\\s*=\\s*"([^"]*)"'
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"
_SCHEME_HOST_RE = "^([a-z][a-z0-9+.-]*://[^/:?#]+)"


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
    lower = F.lower(F.col("raw"))
    scheme_host = F.regexp_extract(F.col("src_url"), _SCHEME_HOST_RE, 1)
    dst = (
        F.when(
            lower.startswith("http://") | lower.startswith("https://"),
            F.col("raw"),
        )
        .when(
            F.col("raw").startswith("/")
            & ~F.col("raw").startswith("//"),
            F.concat(scheme_host, F.col("raw")),
        )
    )
    return (
        exploded.withColumn("dst_url", dst)
        .filter(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url")
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
