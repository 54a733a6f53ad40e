"""End-to-end crawl-engine parity vs the sequential reference simulator
(north_rule: crawl ordering + URL-seen set must match under the same seed
list + politeness budget)."""

import dataclasses

import pytest
import pyspark.sql.functions as F

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.reference_sim import build_corpus, simulate_crawl
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.synth import build_pages_df, listing_url

N_HOSTS, N_ARTICLES = 4, 80


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-crawl", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = build_pages_df(spark, N_HOSTS, N_ARTICLES).cache()
    df.count()
    return df


@pytest.fixture()
def warehouse(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _run_crawl(spark, warehouse, corpus_df, seeds, **opt):
    runner = CrawlRunner(
        spark,
        warehouse,
        CorpusFetcher(corpus_df),
        SYNTH_SOURCE,
        CrawlOptions(**opt),
    )
    runner.seed(seeds)
    return runner, runner.run()


def _sim(host, **kw):
    corpus = build_corpus(N_HOSTS, N_ARTICLES)
    cfg = dataclasses.replace(
        SYNTH_SOURCE,
        listing=dataclasses.replace(
            SYNTH_SOURCE.listing, url=listing_url(host, 1)
        ),
    )
    return simulate_crawl(corpus, cfg, **kw)


def test_single_host_full_parity(spark, warehouse, corpus_df):
    """Engine over one host == reference loop: ordering, payloads, counters,
    seen set, stop reason."""
    runner, summary = _run_crawl(spark, warehouse, corpus_df, [listing_url(0, 1)])
    sim = _sim(0)

    # pages carries processed_order natively; cross-check vs the junction
    eng = warehouse.read("pages").orderBy("processed_order").collect()
    junction = {
        r.content_id: r.processed_order
        for r in warehouse.read("session_content").collect()
    }
    assert all(junction[e.id] == e.processed_order for e in eng)
    assert len(eng) == len(sim.items) == sim.items_processed
    for e, s in zip(eng, sim.items):
        assert e.processed_order == s.processed_order
        assert e.url == s.url
        assert e.title == s.title
        assert (e.content or None) == s.content  # byte-identical markdown
        assert (e.author or None) == s.author
        assert (e.published_date or None) == s.published_date
        assert e.had_extraction_error == s.had_content_extraction_error

    assert summary.items_processed == sim.items_processed
    assert summary.pages_processed == sim.pages_processed
    assert summary.duplicates_skipped == sim.duplicates_skipped
    assert summary.urls_excluded == sim.urls_excluded
    assert summary.total_filtered == sim.total_filtered
    assert summary.contents_crawled == sim.contents_crawled
    assert summary.items_found == sim.items_found
    assert summary.stopped_reason == sim.stopped_reason == "no_next_button"

    # URL-seen membership (session seen-set = every first-occurrence item url)
    eng_seen = {
        r.url_hash for r in warehouse.read("seen_session").distinct().collect()
    }
    assert eng_seen == sim.seen_hashes


def test_multi_host_per_chain_parity(spark, warehouse, corpus_df):
    """All hosts crawled concurrently: each host's relative order, payloads
    and counters equal its sequential chain."""
    seeds = [listing_url(h, 1) for h in range(N_HOSTS)]
    runner, summary = _run_crawl(spark, warehouse, corpus_df, seeds)

    eng = warehouse.read("pages").orderBy("processed_order").collect()
    sims = {h: _sim(h) for h in range(N_HOSTS)}
    assert len(eng) == sum(s.items_processed for s in sims.values())
    # global processed_order must be exactly 1..N
    assert [e.processed_order for e in eng] == list(range(1, len(eng) + 1))
    # per-host subsequence equals the reference chain
    for h, sim in sims.items():
        host = f"news-{h}.example.org"
        eng_h = [e for e in eng if e.host == host]
        assert [e.url for e in eng_h] == [s.url for s in sim.items]
        assert [e.content for e in eng_h] == [s.content for s in sim.items]
    assert summary.items_processed == sum(s.items_processed for s in sims.values())
    assert summary.duplicates_skipped == sum(
        s.duplicates_skipped for s in sims.values()
    )
    assert summary.urls_excluded == sum(s.urls_excluded for s in sims.values())
    assert summary.total_filtered == sum(s.total_filtered for s in sims.values())


def test_max_pages_stop(spark, warehouse, corpus_df):
    runner, summary = _run_crawl(
        spark, warehouse, corpus_df, [listing_url(0, 1)], max_pages=2
    )
    sim = _sim(0, max_pages=2)
    assert summary.stopped_reason == sim.stopped_reason == "max_pages"
    assert summary.pages_processed == sim.pages_processed == 2
    assert summary.items_processed == sim.items_processed


def test_all_duplicates_incremental_recrawl(spark, tmp_path, corpus_df):
    """Second session over a warehouse that already contains every page
    stops immediately with all_duplicates (ArticleListingCrawler.ts:260-286)."""
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    _run_crawl(spark, wh, corpus_df, [listing_url(0, 1)])
    first_pages = wh.read("pages").count()

    runner2 = CrawlRunner(
        spark, wh, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions()
    )
    runner2.seed([listing_url(0, 1)])
    summary2 = runner2.run()
    sim2 = _sim(0, existing_urls={i.url for i in _sim(0).items})
    assert summary2.stopped_reason == sim2.stopped_reason == "all_duplicates"
    assert summary2.items_processed == 0
    assert summary2.pages_processed == sim2.pages_processed == 0
    assert wh.read("pages").count() == first_pages  # nothing re-stored


def test_recrawl_mode_skips_dedup(spark, tmp_path, corpus_df):
    """--recrawl (skipExistingUrls=false, index.ts:39) refetches everything."""
    wh = Warehouse(spark, str(tmp_path / "wh3"))
    _run_crawl(spark, wh, corpus_df, [listing_url(1, 1)])
    n1 = wh.read("pages").count()
    runner2 = CrawlRunner(
        spark,
        wh,
        CorpusFetcher(corpus_df),
        SYNTH_SOURCE,
        CrawlOptions(skip_existing_urls=False),
    )
    runner2.seed([listing_url(1, 1)])
    s2 = runner2.run()
    assert s2.items_processed == n1
    assert wh.read("pages").count() == 2 * n1


def test_politeness_budget_carries_overflow(spark, tmp_path, corpus_df):
    """budget < items/page: overflow items processed in later rounds, order
    still deterministic and complete."""
    wh = Warehouse(spark, str(tmp_path / "wh4"))
    runner, summary = CrawlRunner(
        spark,
        wh,
        CorpusFetcher(corpus_df),
        SYNTH_SOURCE,
        CrawlOptions(per_host_budget=3),
    ), None
    runner.seed([listing_url(1, 1)])
    summary = runner.run()
    sim = _sim(1)
    assert summary.items_processed == sim.items_processed
    eng_urls = {
        r.url for r in wh.read("pages").select("url").collect()
    }
    assert eng_urls == {i.url for i in sim.items}


def test_resume_from_checkpoint(spark, tmp_path, corpus_df):
    """Kill after round 2, resume from snapshot, final state identical to an
    uninterrupted run (T2/north_rule resumability)."""
    wh_a = Warehouse(spark, str(tmp_path / "whA"))
    ra = CrawlRunner(spark, wh_a, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions())
    ra.seed([listing_url(0, 1)])
    full = ra.run()

    wh_b = Warehouse(spark, str(tmp_path / "whB"))
    rb = CrawlRunner(spark, wh_b, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions())
    rb.seed([listing_url(0, 1)])
    rb.run_round(1)
    rb.run_round(2)
    # simulate a crash: fresh runner + warehouse objects, resume from HEAD
    wh_b2 = Warehouse(spark, str(tmp_path / "whB"))
    rb2 = CrawlRunner(
        spark, wh_b2, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions()
    )
    rb2.resume()
    s2 = rb2.run()

    assert s2.items_processed == full.items_processed
    a = sorted(
        (r.processed_order, r.url)
        for r in wh_a.read("pages").select("processed_order", "url").collect()
    )
    b = sorted(
        (r.processed_order, r.url)
        for r in wh_b2.read("pages").select("processed_order", "url").collect()
    )
    assert a == b


def test_shuffle_join_path_identical(spark, tmp_path, corpus_df):
    """broadcast_max_rows=0 forces the shuffle-join fallback in the fetch
    and order joins (the million-URL-round path); output must be identical
    to the broadcast path."""
    wh_bc = Warehouse(spark, str(tmp_path / "wh_bc"))
    _run_crawl(spark, wh_bc, corpus_df, [listing_url(h, 1) for h in range(2)])
    wh_sh = Warehouse(spark, str(tmp_path / "wh_sh"))
    _run_crawl(
        spark,
        wh_sh,
        corpus_df,
        [listing_url(h, 1) for h in range(2)],
        broadcast_max_rows=0,
    )
    cols = ["processed_order", "url", "title", "content", "had_extraction_error"]
    a = sorted(map(tuple, wh_bc.read("pages").select(*cols).collect()))
    b = sorted(map(tuple, wh_sh.read("pages").select(*cols).collect()))
    assert a == b
    sc_a = sorted(
        map(tuple, wh_bc.read("session_content").drop("session_id").collect())
    )
    sc_b = sorted(
        map(tuple, wh_sh.read("session_content").drop("session_id").collect())
    )
    assert sc_a == sc_b
