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


def test_dedup_by_url_keeps_null_and_blank_urls(spark):
    """A NULL or blank URL is NOT a duplicate of anything: such rows
    must all survive (per-row sentinel key), never vanish on a NULL
    join key or collapse into one blank-URL survivor."""
    df = spark.createDataFrame(
        [
            (1, "https://e.com/p"),
            (2, None),
            (3, None),
            (4, ""),
            (5, "   "),
            (6, "https://e.com/p/"),  # true dup of 1
        ],
        "id long, url string",
    )
    kept = sorted(r["id"] for r in dedup_by_url(df, "url", "id").collect())
    assert kept == [1, 2, 3, 4, 5]


def test_registrable_domain_keeps_ipv4_whole(spark):
    df = spark.createDataFrame(
        [(1, "https://192.168.7.4/x"), (2, "https://10.0.7.4/y")],
        "id long, url string",
    )
    out = {
        r["id"]: r["d"]
        for r in df.select(
            "id", url_registrable_domain("url").alias("d")
        ).collect()
    }
    # octets are not labels: unrelated IP hosts must not pool as '7.4'
    assert out == {1: "192.168.7.4", 2: "10.0.7.4"}


def test_content_bearing_ref_param_survives(spark):
    got = _norm(spark, [
        "https://g.com/org/repo/blob/readme?ref=main",
        "https://g.com/org/repo/blob/readme?ref=release-2.0",
    ])
    assert got[0] != got[1]
    assert "ref=main" in got[0]


def test_domain_quota_refuses_to_clobber_existing_column(spark):
    import pytest as pt

    df = spark.createDataFrame(
        [(1, "https://e.com/x", "keep-me")],
        "id long, url string, domain string",
    )
    with pt.raises(ValueError, match="already exists"):
        domain_quota(df, "url", "id", quota=5)
    out = domain_quota(df, "url", "id", quota=5, domain_col="__d")
    row = out.collect()[0]
    assert row["domain"] == "keep-me" and row["__d"] == "e.com"
