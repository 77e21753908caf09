"""URL canonicalization: Spark built-ins vs a urllib reference
implementation, plus the registrable-domain helper."""

from urllib.parse import urlsplit

from mysql_syncer_spark.functions.urls import (
    TRACKING_PARAMS,
    canonical_dedup_stats,
    canonical_url,
    registrable_domain,
    with_canonical_url,
)

CASES = [
    "http://Example.COM/a",
    "http://example.com:80/a",
    "https://example.com:443/a",
    "https://example.com:8443/a",
    "http://example.com/a#section-2",
    "http://example.com/a/",
    "http://example.com/a///",
    "http://example.com",
    "http://example.com/",
    "http://example.com/a?b=2&a=1",
    "http://example.com/a?a=1&b=2",
    "http://example.com/a?utm_source=tw&a=1&utm_medium=x",
    "http://example.com/a?gclid=XYZ",
    "http://example.com/a?fbclid=1&b=2",
    "HTTPS://WWW.Example.com/Path/Is/CaseSensitive",
    "http://example.com/a?x=%20y",
    "  http://example.com/padded  ",
    "http://sub.domain.example.co.uk:80/x?z=1&y=2#f",
    "not a url at all",
]


def _py_canonical(u: str) -> str:
    """Reference implementation with urllib (mirrors the module rules)."""
    u = u.strip()
    s = urlsplit(u)
    if not s.netloc or not s.scheme:
        return u
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = ""
    if s.port and not (
        (scheme == "http" and s.port == 80)
        or (scheme == "https" and s.port == 443)
    ):
        port = f":{s.port}"
    path = s.path.rstrip("/") or "/"
    params = [
        p
        for p in s.query.split("&")
        if p
        and not p.split("=")[0].startswith("utm_")
        and p.split("=")[0] not in TRACKING_PARAMS
    ]
    qs = "&".join(sorted(params))
    return f"{scheme}://{host}{port}{path}" + (f"?{qs}" if qs else "")


def test_canonical_url_matches_urllib_reference(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    for u in CASES:
        assert got[u] == _py_canonical(u), (u, got[u], _py_canonical(u))


def test_canonical_url_is_jvm_only(spark):
    """No Python/UDF stage in the plan — the key is codegen-computable."""
    df = with_canonical_url(spark.createDataFrame([("http://a.com/x",)], "url string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_registrable_domain(spark):
    cases = {
        "http://www.example.com/a": "example.com",
        "https://a.b.news.co.uk/": "news.co.uk",
        "http://example.co.jp/x": "example.co.jp",
        "http://localhost/x": "localhost",  # single label: no eTLD+1
        "not a url": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select("url", registrable_domain("url").alias("d")).collect()
    }
    assert got["http://www.example.com/a"] == "example.com"
    assert got["https://a.b.news.co.uk/"] == "news.co.uk"
    assert got["http://example.co.jp/x"] == "example.co.jp"
    assert got["not a url"] is None


def test_canonical_dedup_collapses_variants(spark):
    variants = [
        "http://Example.com:80/page?utm_source=x",
        "http://example.com/page#top",
        "http://example.com/page/",
        "http://other.com/page",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    stats = {r["url_canon"]: r for r in canonical_dedup_stats(df).collect()}
    assert stats["http://example.com/page"]["n_variants"] == 3
    assert stats["http://example.com/page"]["n_distinct_raw"] == 3
    assert stats["http://other.com/page"]["n_variants"] == 1
