"""URL canonicalization for web-page dedup keys.

At Common-Crawl scale the same page arrives under many spellings of
one URL (scheme/host case, default ports, tracking parameters, query
parameter order, fragments).  Exact-dedup and grouping by URL
(`operators/dedup.py`, `sources/web_pages.py`) need a canonical key,
or near-identical fetches survive exact dedup and skew the per-URL
"byte-identical text" invariant (BASELINE.json input_hint).

`canonicalize_url` is a single Column expression — regexp + array
built-ins only, whole-stage-codegen-friendly, no Python in the hot
path — and each step is mirrored exactly by the DuckDB oracle in
plans/queries.py (q49), so the semantics below are hash-checked:

  1. drop the fragment (`#...`),
  2. lowercase scheme and authority (path/query case preserved),
  3. drop default ports (`:80` for http, `:443` for https),
  4. drop tracking parameters (`utm_*`, `gclid`, `fbclid`),
  5. sort surviving query parameters byte-lexicographically,
  6. empty path becomes "/"; an emptied query drops its "?".

Deliberately out of scope (documented, not implied): percent-encoding
normalization, IDN/punycode, `www.` stripping, path dot-segment
resolution — each changes which DISTINCT pages collapse and so
belongs to site-specific policy, not a generic canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex for parameters that never distinguish page content
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]+|gclid|fbclid)="
# ASCII classes only so Java and DuckDB (RE2-ish) regex agree
_AUTHORITY_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)"


def canonicalize_url(url: Column) -> Column:
    base = F.regexp_replace(url, "#.*", "")
    query = F.regexp_extract(base, r"\?(.*)", 1)
    no_query = F.regexp_replace(base, r"\?.*", "")
    authority = F.regexp_extract(no_query, _AUTHORITY_RE, 1)
    path = F.substring(no_query, F.length(authority) + 1, F.length(no_query))
    auth = F.lower(authority)
    auth = F.regexp_replace(auth, "^(http://[^:/]*):80$", "$1")
    auth = F.regexp_replace(auth, "^(https://[^:/]*):443$", "$1")
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        auth,
        F.when(F.length(path) > 0, path).otherwise(F.lit("/")),
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
