"""URL canonicalization — the first normalization pass of any web-crawl
dedup pipeline (the reference's corpus is Common-Crawl-style pages keyed by
url; exact-dup detection across re-crawls starts by collapsing URL aliases).

Pure JVM Column expressions (lower/regexp_extract/regexp_replace/concat) —
whole-stage codegen, no Python — applying a fixed, documented spec:

1. drop the fragment (`#...`)
2. lowercase the scheme and host (path/query case is preserved — it is
   significant on most servers)
3. strip a leading `www.`
4. strip the scheme's default port (`:80` for http, `:443` for https)
5. drop tracking parameters (`utm_*`, `fbclid`, `gclid`), collapsing any
   leftover `&&` / leading / trailing `&`
6. empty path → `/`

The regex subset used (character classes, anchors, alternation — no
lookaround or backreferences) behaves identically in Java regex (Spark) and
RE2 (DuckDB), which is what lets the driver value-oracle the operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = "(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL per the module spec. Input without a scheme
    is returned lowercased-host-only best-effort (treated as host+path)."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    after = F.regexp_replace(no_frag, _SCHEME_RE, "")

    hostport = F.lower(F.regexp_extract(after, "^([^/?]*)", 1))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)

    path = F.regexp_extract(after, "^[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(after, "[?](.*)$", 1)
    query = F.regexp_replace(query, _TRACKING_RE, "")
    query = F.regexp_replace(query, "&+", "&")
    query = F.regexp_replace(query, "^&|&$", "")

    base = F.concat(
        F.when(scheme == "", F.lit("")).otherwise(F.concat(scheme, F.lit("://"))),
        host,
        path,
    )
    return F.when(query == "", base).otherwise(F.concat(base, F.lit("?"), query))


CANONICALIZE_URL_SQL_SPEC = r"""
  The DuckDB restatement of canonicalize_url (same operation order; DuckDB
  regexp_replace needs the explicit 'g' flag Spark applies implicitly).
"""


def canonicalize_url_sql(col: str) -> str:
    """The identical canonicalization as a DuckDB SQL expression over column
    `col` — used by the driver oracle."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    no_frag = f"regexp_replace({col}, '#.*$', '', 'g')"
    after = f"regexp_replace({no_frag}, '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g')"
    hostport = f"lower(regexp_extract({after}, '^([^/?]*)', 1))"
    host = f"regexp_replace({hostport}, '^www\\.', '', 'g')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '', 'g') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '', 'g') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({after}, '^[^/?]*([^?]*)', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({after}, '[?](.*)$', 1)"
    query = (
        f"regexp_replace(regexp_replace(regexp_replace({query}, "
        f"'(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g'), "
        f"'&+', '&', 'g'), '^&|&$', '', 'g')"
    )
    base = (
        f"(CASE WHEN {scheme} = '' THEN '' ELSE {scheme} || '://' END) || "
        f"{host} || {path}"
    )
    return f"CASE WHEN {query} = '' THEN {base} ELSE {base} || '?' || {query} END"
