"""PageRank-prioritized frontier + global round candidate budget
(VERDICT r4 items 1 and 7).

With ``prioritize_by_rank=True`` the runner accumulates the discovered
host link graph (listing_host → item_host) in the ``link_edges`` state
table and feeds exact integer PageRank (ops/graph.py) into the frontier
``priority`` column each round — so the schedule (``processed_order``)
crawls high-value hosts first. The e2e below pins the FULL resulting
order against a hand-computed schedule on a corpus where the
authoritative host sorts alphabetically LAST (so rank order and the
default host order provably differ).

``round_content_budget=K`` caps content fetches per round ACROSS hosts:
the round fetches exactly the K highest-priority candidates (same total
order as processed_order) and carries the rest — bounding round size
regardless of frontier growth.
"""

import pytest
import pyspark.sql.functions as F

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.synth import build_pages_df, listing_url

HUB1, HUB2 = "hub-1.example.org", "hub-2.example.org"
# the popular host (linked from BOTH hubs) is alphabetically LAST: default
# (host-ordered) scheduling would crawl it last, rank scheduling first
POP = "z-popular.example.org"
NICHE_A = "a-niche.example.org"  # linked from hub-1 only
NICHE_M = "m-niche.example.org"  # linked from hub-2 only


def _item(url, title):
    return (
        f'<div class="post-item"><span class="post-title">{title}</span>'
        f'<a class="post-link" href="{url}">read</a>'
        '<span class="post-date">2024-01-05</span>'
        '<span class="post-author">Ann Author</span></div>'
    )


def _listing(items, next_path=None):
    nxt = (
        f'<div class="pagination"><a class="next" href="{next_path}">next</a></div>'
        if next_path
        else ""
    )
    return (
        f'<html><body><div class="post-list">{"".join(items)}</div>{nxt}'
        "</body></html>"
    )


def _article(title):
    return (
        '<html><body><div id="main">'
        f"<header><h1>{title}</h1></header>"
        '<div class="byline">By Ann Author</div>'
        f'<div class="article-body"><p>Body of {title}.</p></div>'
        "</div></body></html>"
    )


def _u(host, i):
    return f"https://{host}/item/{i}"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-rank-pri", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def hub_corpus(spark):
    """Two hub listing chains (2 pages each) whose items live on OTHER
    hosts: z-popular is linked from both hubs, the niche hosts from one
    hub each → rank(z-popular) > rank(a-niche) = rank(m-niche)."""
    rows = [
        # hub-1: page 1 → page 2
        (
            f"https://{HUB1}/list/1",
            _listing([_item(_u(POP, 1), "P1"), _item(_u(NICHE_A, 1), "A1")],
                     "/list/2"),
        ),
        (
            f"https://{HUB1}/list/2",
            _listing([_item(_u(POP, 2), "P2"), _item(_u(NICHE_A, 2), "A2")]),
        ),
        # hub-2: page 1 → page 2
        (
            f"https://{HUB2}/list/1",
            _listing([_item(_u(NICHE_M, 1), "M1"), _item(_u(POP, 3), "P3")],
                     "/list/2"),
        ),
        (
            f"https://{HUB2}/list/2",
            _listing([_item(_u(NICHE_M, 2), "M2"), _item(_u(POP, 4), "P4")]),
        ),
    ] + [
        (_u(h, i), _article(t))
        for h, i, t in [
            (POP, 1, "P1"), (POP, 2, "P2"), (POP, 3, "P3"), (POP, 4, "P4"),
            (NICHE_A, 1, "A1"), (NICHE_A, 2, "A2"),
            (NICHE_M, 1, "M1"), (NICHE_M, 2, "M2"),
        ]
    ]
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows], "url string, html binary"
    ).cache()


def test_rank_priority_schedule_hand_computed(spark, tmp_path, hub_corpus):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    runner = CrawlRunner(
        spark,
        wh,
        CorpusFetcher(hub_corpus),
        SYNTH_SOURCE,
        CrawlOptions(prioritize_by_rank=True, rank_iters=2),
    )
    runner.seed([f"https://{HUB1}/list/1", f"https://{HUB2}/list/1"])
    summary = runner.run()
    assert summary.items_processed == 8

    got = {
        r.url: r.processed_order
        for r in wh.read("pages").select("url", "processed_order").collect()
    }
    # Hand-computed schedule:
    # round 1 — link graph still empty → priority 0.0 everywhere; order =
    #   (depth, host, listing_order): a-niche/1, m-niche/1, then z-popular
    #   items by listing position (P1 pos 0 on hub-1, P3 pos 1 on hub-2).
    # round 2 — edges {hub1→z, hub1→a, hub2→m, hub2→z} give z-popular two
    #   inlinks vs one each for the niche hosts → rank(z) highest →
    #   priority most negative → z-popular items FIRST despite sorting
    #   last alphabetically; the equal-rank niche hosts tie-break by host.
    assert got == {
        _u(NICHE_A, 1): 1,
        _u(NICHE_M, 1): 2,
        _u(POP, 1): 3,
        _u(POP, 3): 4,
        _u(POP, 2): 5,
        _u(POP, 4): 6,
        _u(NICHE_A, 2): 7,
        _u(NICHE_M, 2): 8,
    }
    # the accumulated link graph is exactly the cross-host edge set
    edges = {
        (r.src_host, r.dst_host)
        for r in wh.read("link_edges").collect()
    }
    assert edges == {
        (HUB1, POP), (HUB1, NICHE_A), (HUB2, POP), (HUB2, NICHE_M),
    }


def test_rank_off_schedule_is_host_ordered(spark, tmp_path, hub_corpus):
    """Control: without the option the same corpus schedules in plain
    (depth, host, listing_order) order and writes no link_edges table."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    runner = CrawlRunner(
        spark, wh, CorpusFetcher(hub_corpus), SYNTH_SOURCE, CrawlOptions()
    )
    runner.seed([f"https://{HUB1}/list/1", f"https://{HUB2}/list/1"])
    runner.run()
    got = {
        r.url: r.processed_order
        for r in wh.read("pages").select("url", "processed_order").collect()
    }
    assert got == {
        _u(NICHE_A, 1): 1,
        _u(NICHE_M, 1): 2,
        _u(POP, 1): 3,
        _u(POP, 3): 4,
        _u(NICHE_A, 2): 5,  # round 2 reverts to host order
        _u(NICHE_M, 2): 6,
        _u(POP, 2): 7,
        _u(POP, 4): 8,
    }
    assert wh.read("link_edges", "src_host string, dst_host string").count() == 0


N_HOSTS, N_ARTICLES = 4, 80


def test_global_round_budget_takes_topk_and_carries_rest(spark, tmp_path):
    """round_content_budget=K: round 1 stores EXACTLY the first K rows of
    the unbudgeted total order; everything else carries and the final url
    set matches the unbudgeted crawl."""
    corpus = build_pages_df(spark, N_HOSTS, N_ARTICLES).cache()
    corpus.count()
    seeds = [listing_url(h, 1) for h in range(N_HOSTS)]

    def crawl(**opt):
        wh = Warehouse(spark, str(tmp_path / f"wh-{len(opt)}"))
        runner = CrawlRunner(
            spark, wh, CorpusFetcher(corpus), SYNTH_SOURCE, CrawlOptions(**opt)
        )
        runner.seed(seeds)
        s = runner.run()
        rows = (
            wh.read("pages")
            .select("url", "processed_order")
            .orderBy("processed_order")
            .collect()
        )
        return s, [r.url for r in rows]

    K = 10
    s_full, full_order = crawl()
    s_bud, bud_order = crawl(round_content_budget=K)
    # same coverage, deterministic order in both runs
    assert set(bud_order) == set(full_order)
    assert s_bud.items_processed == s_full.items_processed
    # the budgeted round 1 is the exact K-prefix of the unbudgeted order
    assert bud_order[:K] == full_order[:K]
    # and the budgeted session needed more rounds (the carry is real)
    assert s_bud.rounds > s_full.rounds
    corpus.unpersist()


def test_rank_priority_resume_parity(spark, tmp_path, hub_corpus):
    """Priorities derive from COMMITTED link_edges state, so a session
    killed between rounds and resumed must produce the identical
    rank-prioritized schedule (the uninterrupted hand-computed one)."""
    opts = dict(prioritize_by_rank=True, rank_iters=2)
    seeds = [f"https://{HUB1}/list/1", f"https://{HUB2}/list/1"]

    wh_a = Warehouse(spark, str(tmp_path / "whA"))
    ra = CrawlRunner(
        spark, wh_a, CorpusFetcher(hub_corpus), SYNTH_SOURCE,
        CrawlOptions(**opts),
    )
    ra.seed(seeds)
    ra.run()

    wh_b = Warehouse(spark, str(tmp_path / "whB"))
    rb = CrawlRunner(
        spark, wh_b, CorpusFetcher(hub_corpus), SYNTH_SOURCE,
        CrawlOptions(**opts),
    )
    rb.seed(seeds)
    rb.run_round(1)
    # crash between rounds: fresh objects resume from the last commit —
    # round 2 must recompute the SAME ranks from the committed edges
    wh_b2 = Warehouse(spark, str(tmp_path / "whB"))
    rb2 = CrawlRunner(
        spark, wh_b2, CorpusFetcher(hub_corpus), SYNTH_SOURCE,
        CrawlOptions(**opts),
    )
    rb2.resume()
    rb2.run()

    a = sorted(
        (r.processed_order, r.url)
        for r in wh_a.read("pages").select("processed_order", "url").collect()
    )
    b = sorted(
        (r.processed_order, r.url)
        for r in wh_b2.read("pages").select("processed_order", "url").collect()
    )
    assert a == b and len(a) == 8
