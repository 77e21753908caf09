"""URL canonicalization — the dedup key a webtext pipeline actually joins
on (the same page arrives as http://Example.com:80/a?utm_source=x#frag and
https://example.com/a).

Everything is JVM built-ins (`parse_url`, regexp, higher-order array
functions) — whole-stage codegen end to end, no Python in the hot path, so
the canonical key can be computed inline in the 100 TB merge without a
UDF boundary.

Rules (the conservative, widely-agreed subset):
- scheme and host lowercased;
- fragment stripped;
- default ports dropped (http:80, https:443), explicit others kept;
- path: repeated trailing slashes stripped, empty path -> "/";
- query: tracking params removed (utm_*, gclid, fbclid, msclkid,
  mc_eid, igshid), remaining params sorted for order-independence,
  empty query dropped;
- URLs that do not parse (no host) pass through trimmed, so the column
  stays total (`try_parse_url`: invalid input -> NULL, never a throw).

Percent-encoding normalization is deliberately NOT attempted: decoding
changes semantics for reserved characters and the cases it would merge
are rare; a pipeline that needs it adds one mapInPandas stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid")

# two-level public suffixes the naive registrable-domain helper knows;
# a production deployment swaps in the full Public Suffix List.
_TWO_LEVEL_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar",
)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring for rules)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    no_frag = F.substring_index(u, "#", 1)
    proto = F.lower(F.try_parse_url(no_frag, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(no_frag, F.lit("HOST")))
    authority = F.try_parse_url(no_frag, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    raw_path = F.try_parse_url(no_frag, F.lit("PATH"))
    path = F.regexp_replace(F.coalesce(raw_path, F.lit("")), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(no_frag, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split(p, "=").getItem(0).startswith("utm_")
        & ~F.split(p, "=").getItem(0).isin(*TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(host.isNull() | proto.isNull(), u).otherwise(rebuilt)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(url_col))


def registrable_domain(url: Column | str) -> Column:
    """Naive eTLD+1 from a URL column: last two host labels, or last three
    when the last two are a known two-level public suffix. NULL when the
    URL has no host."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(F.trim(u), F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    two_level = last2.isin(*_TWO_LEVEL_TLDS)
    dom = F.when(
        n >= 3,
        F.when(
            two_level,
            F.concat_ws(".", F.element_at(labels, -3), last2),
        ).otherwise(last2),
    ).otherwise(F.when(n == 2, last2))
    return F.when(host.isNull() | (host == ""), F.lit(None)).otherwise(dom)


def canonical_dedup_stats(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-canonical-URL group stats: how many raw variants collapse into
    each canonical key (one shuffle, map-side partial count)."""
    return (
        with_canonical_url(df, url_col)
        .groupBy("url_canon")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct(url_col).alias("n_distinct_raw"),
        )
    )
