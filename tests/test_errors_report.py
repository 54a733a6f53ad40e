"""Error message lists + crawl-errors report (reference
core/types.ts:165-166 listingErrors/contentErrors, commands/errors.ts).

The synthetic corpus plants every error class at fixed positions:
omit_url/omit_title items (missing required listing fields), ghost dead
links (content fetch misses), and no-article-body pages (content
extraction failures) — so the crawl must surface reference-format
messages for each, persist them in the session row, and the `errors`
report must render the reference's sections."""

import json

import pytest

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.serve.errors_report import render_errors_report
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.synth import (
    build_pages_df,
    content_extraction_fails,
    listing_items_spec,
    listing_url,
    zipf_article_counts,
)

N_HOSTS, N_ARTICLES = 3, 60


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-errors", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    corpus = build_pages_df(spark, N_HOSTS, N_ARTICLES).cache()
    corpus.count()
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("errs") / "wh"))
    runner = CrawlRunner(
        spark, wh, CorpusFetcher(corpus), SYNTH_SOURCE, CrawlOptions()
    )
    runner.seed([listing_url(h, 1) for h in range(N_HOSTS)])
    return wh, runner.run()


def _planted(kind):
    """Expected error messages derived from the corpus spec."""
    from ethos_spark.synth import ITEMS_PER_LISTING

    counts = zipf_article_counts(N_HOSTS, N_ARTICLES)
    out = []
    for h, c in enumerate(counts):
        p = 1
        while (p - 1) * ITEMS_PER_LISTING < c:
            for it in listing_items_spec(h, p, c):
                out.append((h, p, it))
            p += 1
    return out


def test_listing_error_messages_reference_format(crawled):
    wh, summary = crawled
    msgs = summary.listing_error_messages
    assert msgs, "synthetic corpus plants missing-required-field items"
    # an omit_url item: identifier falls back to the title, missing field
    # list in config order, suffixed with the listing page url
    omit_url = [
        (h, p, it) for h, p, it in _planted("listing") if it["omit_url"]
    ]
    assert omit_url, "corpus should plant omit_url items"
    h, p, it = omit_url[0]
    expected = (
        f'Item "{it["title"]}" missing required fields: url. '
        f"Seen at {listing_url(h, p)}"
    )
    assert expected in msgs
    # an omit_title item: identifier is the url
    omit_title = [
        (h, p, it)
        for h, p, it in _planted("listing")
        if it["omit_title"] and not it["omit_url"]
    ]
    if omit_title:
        h, p, it = omit_title[0]
        assert (
            f'Item "{it["url"]}" missing required fields: title. '
            f"Seen at {listing_url(h, p)}"
        ) in msgs
    # counter/list consistency: every message is a planted validation miss
    assert all("missing required fields" in m for m in msgs)


def test_content_error_messages_and_session_persistence(crawled):
    wh, summary = crawled
    msgs = summary.content_error_messages
    assert msgs, "synthetic corpus plants content extraction failures"
    # planted no-article-body page → required-content selector message
    stored_urls = {r.url for r in wh.read("pages").collect()}
    fail_urls = [
        it["url"]
        for h, p, it in _planted("content")
        if not it["omit_url"] and not it["external"]
        and "/ghost-" not in it["url"] and "/press-release/" not in it["url"]
        and content_extraction_fails(h, it["article_idx"])
        and it["url"] in stored_urls
    ]
    assert fail_urls
    expected = (
        f"Content extraction failed for {fail_urls[0]} : Required field "
        "'content' not found: selector '.article-body' returned no results"
    )
    assert expected in msgs
    # ghost dead link → fetch-miss message
    ghosts = [m for m in msgs if "/ghost-" in m]
    assert ghosts and all(
        "Failed to extract content data for" in m for m in ghosts
    )
    # persisted in the session row metadata (core/types.ts:165-166)
    sess = wh.read("sessions").collect()
    meta = json.loads(sess[0].metadata)
    assert meta["content_error_messages"] == msgs
    assert meta["listing_error_messages"] == summary.listing_error_messages


def test_errors_report_sections(spark, crawled):
    wh, summary = crawled
    from ethos_spark import schemas

    sess = wh.read("sessions").collect()[0]
    fs = wh.read("field_stats", schemas.FIELD_STATS)
    report = render_errors_report(sess, fs, "2026-01-01T00:00:00Z")
    assert report.startswith(
        f"Crawling Errors Report for {SYNTH_SOURCE.name} ({SYNTH_SOURCE.id})"
    )
    assert "LISTING EXTRACTION ERRORS" in report
    assert "Required Field Extraction Issues:" in report
    # omit_url/omit_title items make both required listing fields lossy
    assert "item(s) missing required field: title" in report
    assert "item(s) missing required field: url" in report
    assert "General Listing Errors:" in report
    assert "CONTENT EXTRACTION ERRORS" in report
    assert "1. Content extraction failed for" in report
    assert "SUMMARY" in report
    n_l = len(summary.listing_error_messages)
    n_c = len(summary.content_error_messages)
    assert f"Listing errors: {n_l}" in report
    assert f"Content errors: {n_c}" in report
    # numbering continues after the field issues (errors.ts:57-64)
    import re

    m = re.search(r"Field extraction issues: (\d+)", report)
    n_f = int(m.group(1))
    assert f"Total errors: {n_f + n_l + n_c}" in report
    assert f"\n{n_f + 1}. " in report.split("General Listing Errors:")[1]


def test_no_errors_report():
    class Row:
        id = "s"
        source_name = "X"
        source_id = "x"
        metadata = json.dumps(
            {"listing_error_messages": [], "content_error_messages": []}
        )

    import pyspark.sql.functions as F  # noqa: F401
    from ethos_spark import schemas

    spark = get_spark("test-errors", master="local[2]", shuffle_partitions=2)
    empty_fs = spark.createDataFrame([], schemas.FIELD_STATS)
    assert (
        render_errors_report(Row(), empty_fs, "now")
        == "No errors found during crawling!"
    )
