"""URL curation functions: normalization ground truth + idempotence,
registrable-domain heuristic, URL dedup, per-domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.functions.urls import (
    dedup_by_url,
    domain_quota,
    normalize_url,
    url_host,
    url_registrable_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["n"] for r in df.select(normalize_url("url").alias("n")).collect()]


def test_normalize_url_ground_truth(spark):
    cases = {
        # scheme+host lowercase, default port stripped, fragment dropped
        "HTTP://Example.COM:80/a/b#frag": "http://example.com/a/b",
        "https://Example.com:443/": "https://example.com",
        # non-default port kept
        "https://example.com:8443/x": "https://example.com:8443/x",
        # tracking params stripped, remaining params sorted
        "https://e.com/p?utm_source=x&b=2&a=1&fbclid=abc":
            "https://e.com/p?a=1&b=2",
        # all params tracking → no query part
        "https://e.com/p?gclid=1&utm_campaign=c": "https://e.com/p",
        # trailing slash stripped
        "https://e.com/a/b/": "https://e.com/a/b",
        # non-URL passes through trimmed
        "  not a url  ": "not a url",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values()), list(zip(cases, got))


def test_normalize_url_idempotent(spark):
    urls = [
        "HTTP://Example.COM:80/a/b/?utm_source=x&z=9&a=1#f",
        "https://sub.Site.co.uk/path/",
        "plain text",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice


def test_url_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.example.com/a"),
            (2, "https://a.b.site.co.uk/x"),
            (3, "https://localhost/x"),
            (4, "nonsense"),
        ],
        "id long, url string",
    )
    out = {
        r["id"]: (r["h"], r["d"])
        for r in df.select(
            "id",
            url_host("url").alias("h"),
            url_registrable_domain("url").alias("d"),
        ).collect()
    }
    assert out[1] == ("www.example.com", "example.com")
    assert out[2] == ("a.b.site.co.uk", "site.co.uk")
    assert out[3] == ("localhost", "localhost")
    assert out[4] == (None, None)


def test_dedup_by_url_keeps_min_id_per_normalized(spark):
    df = spark.createDataFrame(
        [
            (1, "https://e.com/p?a=1&b=2"),
            (2, "HTTPS://E.com/p/?b=2&a=1&utm_source=x"),  # same normalized
            (3, "https://e.com/q"),
        ],
        "id long, url string",
    )
    kept = sorted(r["id"] for r in dedup_by_url(df, "url", "id").collect())
    assert kept == [1, 3]


def test_domain_quota_caps_per_registrable_domain(spark):
    rows = [(i, f"https://sub{i % 3}.bulk.com/page/{i}") for i in range(30)]
    rows += [(100 + i, f"https://rare{i}.org/x") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = domain_quota(df, "url", "id", quota=5)
    by_domain: dict[str, int] = {}
    for r in out.collect():
        by_domain[r["domain"]] = by_domain.get(r["domain"], 0) + 1
    assert by_domain["bulk.com"] == 5        # 30 pages capped to 5
    for i in range(3):
        assert by_domain[f"rare{i}.org"] == 1
    # deterministic: rerun keeps the identical id set
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in domain_quota(df, "url", "id", quota=5).collect())
    assert a == b
