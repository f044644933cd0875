"""URL canonicalization for web-corpus pipelines.

Common-Crawl-scale dedup and grouping key on URLs only after
canonicalization — the same page arrives as `HTTPS://Site.COM:443/a?b=2&a=1#x`
and `https://site.com/a?a=1&b=2`. This operator normalizes both to one key
as a pure column-expression chain (map-only, fused into the scan, no UDF):

  - scheme and host lowercase;
  - default ports stripped (:80 for http, :443 for https);
  - fragment dropped (never sent to the server);
  - query parameters sorted lexicographically (order carries no meaning
    for the overwhelming majority of endpoints — documented assumption);
  - empty path becomes '/'.

Components come from ONE anchored regex with only capturing/non-capturing
groups (no lookaround), so an RE2 engine reproduces the exact split — the
DuckDB oracle hash-matches full normalized URLs byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# groups: 1 scheme, 2 host, 3 port, 4 path, 5 query, 6 fragment
URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#:]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds scheme, host, port, path, query, fragment columns (raw,
    un-normalized; empty string where the component is absent)."""
    u = F.col(url_col)
    out = df
    for i, name in enumerate(
        ["scheme", "host", "port", "path", "query", "fragment"], start=1
    ):
        out = out.withColumn(name, F.regexp_extract(u, URL_RE, i))
    return out


def normalize_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm`` (the canonical key), ``host_norm`` and
    ``domain`` (last two host labels — the naive registered-domain cut;
    a public-suffix list refines it where available)."""
    out = url_parts(df, url_col)
    scheme = F.lower(F.col("scheme"))
    host = F.lower(F.col("host"))
    is_default = (
        ((scheme == "http") & (F.col("port") == "80"))
        | ((scheme == "https") & (F.col("port") == "443"))
        | (F.col("port") == "")
    )
    port = F.when(is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), F.col("port"))
    )
    path = F.when(F.col("path") == "", F.lit("/")).otherwise(F.col("path"))
    query = F.when(F.col("query") == "", F.lit("")).otherwise(
        F.concat(
            F.lit("?"),
            F.array_join(F.sort_array(F.split(F.col("query"), "&")), "&"),
        )
    )
    # Anything the regex can't split soundly falls back to the raw URL as
    # the canonical key: a rejected match (missing scheme, userinfo@host)
    # extracts an empty host — without a guard every such URL would
    # collapse to the constant ':///', one shared key a dedup pipeline
    # would treat as one page — and an IPv6 bracket literal HALF-parses
    # (host captures up to the first ':', the rest leaks into path), so
    # bracket hosts are unparseable too.
    bad = (host == "") | host.contains("[")
    built = F.concat(scheme, F.lit("://"), host, port, path, query)
    host_norm = F.when(bad, F.lit("")).otherwise(host)
    return (
        out.withColumn(
            "url_norm",
            F.when(bad, F.col(url_col)).otherwise(built),
        )
        .withColumn("host_norm", host_norm)
        .withColumn("domain", F.regexp_extract(host_norm, r"([^.]+\.[^.]+)$", 1))
    )
