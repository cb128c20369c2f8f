"""URL canonicalization — the Common-Crawl pre-dedup normalizer.

Crawl stores hold the same resource under syntactic variants
(`HTTP://Site.Example:80/a//b#frag` vs `http://site.example/a/b`);
canonicalizing before the url-keyed snapshot dedup merges them.  The
normalizer is pure JVM column expressions (lower/regexp_replace —
whole-stage codegen, zero Python, zero shuffle):

    1. scheme and host lowercased (path/query case preserved)
    2. fragment stripped (#...)
    3. default port dropped (:80 for http, :443 for https)
    4. duplicate slashes in the path collapsed (// → /)
    5. trailing "?" (empty query) stripped
    6. trailing slash on a non-root path stripped

Verified against an independent urllib-based Python reference over
edge-case fixtures and the generated corpus
(tests/test_urls.py); idempotence is property-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://host[:port] is everything before the first '/' after '://'
_AUTH = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonical_url(url: Column) -> Column:
    """The canonical form of a url column (steps 1-6 above)."""
    u = F.regexp_replace(url, r"#.*$", "")                       # 2
    # lowercase scheme+authority only: split at the authority edge
    auth = F.lower(F.regexp_extract(u, _AUTH, 1))                # 1
    rest = F.regexp_replace(u, _AUTH, "")
    auth = F.regexp_replace(auth, r"^(http://[^/?#]*):80$", "$1")   # 3
    auth = F.regexp_replace(auth, r"^(https://[^/?#]*):443$", "$1")
    # path = rest up to '?', query preserved verbatim
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_replace(rest, r"^[^?]*", "")
    path = F.regexp_replace(path, r"/{2,}", "/")                 # 4
    path = F.regexp_replace(path, r"(.)/$", "$1")                # 6
    query = F.regexp_replace(query, r"^\?$", "")                 # 5
    return F.concat(auth, path, query)


def canonicalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Replace ``url_col`` with its canonical form (all other columns
    untouched); feed the result to latest_snapshot for variant-merging
    dedup."""
    return pages.withColumn(url_col, canonical_url(F.col(url_col)))
