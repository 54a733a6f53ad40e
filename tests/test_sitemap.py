"""Sitemap source: urlset/sitemapindex parsing (plain + gzipped),
iterative index resolution through a Fetcher, malformed-XML quarantine."""

import gzip

import pytest

from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.session import get_spark
from ethos_spark.sources.sitemap import (
    discover_seed_urls,
    extract_sitemap_urls,
    parse_sitemap_bytes,
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-sitemap", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _urlset(urls, lastmod=True):
    rows = "".join(
        f"<url><loc>{u}</loc>"
        + (f"<lastmod>2025-0{i % 9 + 1}-01</lastmod>" if lastmod else "")
        + "</url>"
        for i, u in enumerate(urls)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + rows + "</urlset>"
    ).encode()


def _index(children):
    rows = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in children)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + rows + "</sitemapindex>"
    ).encode()


def test_parse_urlset_index_gzip_and_garbage():
    out = parse_sitemap_bytes(_urlset(["https://a/1", "https://a/2"]))
    assert [(u, k) for u, k, _m in out] == [
        ("https://a/1", "page"), ("https://a/2", "page"),
    ]
    assert out[0][2] == "2025-01-01"
    idx = parse_sitemap_bytes(_index(["https://a/s1.xml", "https://a/s2.xml"]))
    assert [(u, k) for u, k, _m in idx] == [
        ("https://a/s1.xml", "sitemap"), ("https://a/s2.xml", "sitemap"),
    ]
    # .xml.gz convention
    gz = gzip.compress(_urlset(["https://a/3"]))
    assert parse_sitemap_bytes(gz)[0][0] == "https://a/3"
    # malformed inputs quarantine to [] (no crash)
    assert parse_sitemap_bytes(b"<html>not a sitemap</html>") == []
    assert parse_sitemap_bytes(b"\x00\xff junk") == []
    assert parse_sitemap_bytes(b"\x1f\x8b truncated gz") == []


def test_discover_through_fetcher_resolves_indexes(spark):
    pages_a = [f"https://a/p/{i}" for i in range(5)]
    pages_b = [f"https://b/p/{i}" for i in range(3)]
    corpus_rows = [
        ("https://a/sitemap.xml", _index(
            ["https://a/s1.xml.gz", "https://a/s2.xml"]
        )),
        ("https://a/s1.xml.gz", gzip.compress(_urlset(pages_a[:3]))),
        ("https://a/s2.xml", _urlset(pages_a[3:])),
        ("https://b/sitemap.xml", _urlset(pages_b)),
    ]
    corpus = spark.createDataFrame(corpus_rows, "url string, html binary")
    out = discover_seed_urls(
        spark,
        CorpusFetcher(corpus),
        ["https://a/sitemap.xml", "https://b/sitemap.xml"],
    )
    got = sorted(r.url for r in out.collect())
    assert got == sorted(pages_a + pages_b)
    # exploded extraction keeps provenance
    fetched = CorpusFetcher(corpus).fetch(
        spark.createDataFrame([("https://b/sitemap.xml",)], "url string")
    )
    rows = extract_sitemap_urls(fetched).collect()
    assert all(r.source_url == "https://b/sitemap.xml" for r in rows)


def test_robots_sitemap_lines_bootstrap():
    from ethos_spark.crawl.robots import extract_sitemap_lines

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://a.example.org/sitemap.xml\n"
        "# comment\nsitemap:   https://a.example.org/news.xml.gz\nSitemap:\n"
    )
    assert extract_sitemap_lines(txt) == [
        "https://a.example.org/sitemap.xml",
        "https://a.example.org/news.xml.gz",
    ]


def test_entity_expansion_and_gzip_bomb_rejected():
    """ADVICE r4: untrusted-input hardening — DTD/entity declarations and
    oversized .xml.gz inflation quarantine to [] instead of OOMing."""
    from ethos_spark.sources import sitemap as sm

    laughs = (
        b'<?xml version="1.0"?><!DOCTYPE lolz ['
        b'<!ENTITY lol "lol"><!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;">'
        b']><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://a/&lol2;</loc></url></urlset>"
    )
    assert sm.parse_sitemap_bytes(laughs) == []
    # any DOCTYPE at all is rejected (defusedxml-style), even inert ones
    doctype = b'<!DOCTYPE urlset SYSTEM "x.dtd">' + _urlset(["https://a/1"])
    assert sm.parse_sitemap_bytes(doctype) == []
    # gzip bomb: tiny compressed, inflates past the cap -> []
    bomb = gzip.compress(b"0" * (sm.MAX_INFLATED_BYTES + 1024), 9)
    assert len(bomb) < 1 << 20
    assert sm.parse_sitemap_bytes(bomb) == []
    # a legitimate gzipped sitemap still parses
    ok = gzip.compress(_urlset(["https://a/ok"]))
    assert sm.parse_sitemap_bytes(ok)[0][0] == "https://a/ok"
