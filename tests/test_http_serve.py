"""HTTP serve layer over a crawled warehouse: route surface, response
shapes, pagination meta and error semantics vs the reference express app
(src/server/index.ts, routes/api/publications.ts, middleware/error.ts)."""

import json
import urllib.error
import urllib.request

import pytest

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.serve.http import ApiApp, serve_background
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.synth import build_pages_df, listing_url


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-http", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    corpus = build_pages_df(spark, 2, 40).cache()
    corpus.count()
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("http") / "wh"))
    runner = CrawlRunner(
        spark, wh, CorpusFetcher(corpus), SYNTH_SOURCE, CrawlOptions()
    )
    runner.seed([listing_url(h, 1) for h in range(2)])
    summary = runner.run()
    app = ApiApp.from_warehouse(spark, wh.path, [SYNTH_SOURCE])
    srv, base = serve_background(app)
    yield base, wh, summary
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            body = r.read()
            return r.status, json.loads(body) if body else None
    except urllib.error.HTTPError as e:
        body = e.read()
        return e.code, json.loads(body) if body else None


def test_health_and_sources(served):
    base, _, _ = served
    status, body = _get(base + "/api/health")
    assert status == 200 and body["status"] == "ok"
    status, body = _get(base + "/api/sources")
    assert status == 200
    assert body == [{"id": SYNTH_SOURCE.id, "name": SYNTH_SOURCE.name}]


def test_publications_list_and_meta(served):
    base, wh, _ = served
    total = wh.read("pages").count()
    status, body = _get(base + "/api/publications?limit=7&page=2")
    assert status == 200
    meta = body["meta"]
    assert meta["total"] == total
    assert meta["page"] == 2 and meta["limit"] == 7
    assert meta["totalPages"] == -(-total // 7)
    assert len(body["results"]) == 7
    pub = body["results"][0]
    assert set(pub) == {
        "url", "title", "content", "author", "publishedDate",
        "source", "crawledAt", "hash",
    }
    # default limit 10 (publications.ts:31), bad params ignored
    status, body = _get(base + "/api/publications?limit=abc&page=-3")
    assert status == 200 and body["meta"]["limit"] == 10
    assert body["meta"]["page"] == 1
    # source filter
    status, body = _get(base + "/api/publications?source=" + SYNTH_SOURCE.id)
    assert body["meta"]["total"] == total
    status, body = _get(base + "/api/publications?source=nope")
    assert body["meta"]["total"] == 0 and body["results"] == []


def test_publication_by_hash(served):
    base, wh, _ = served
    row = wh.read("pages").limit(1).collect()[0]
    status, body = _get(base + f"/api/publications/{row.hash}")
    assert status == 200
    assert body["url"] == row.url and body["hash"] == row.hash
    # invalid hash → empty 404 (publications.ts:122-126)
    status, body = _get(base + "/api/publications/nothex")
    assert status == 404 and body is None
    # valid-but-absent hash → reference errorHandler quirk: 400 + typed
    # error body (middleware/error.ts:27-31)
    status, body = _get(base + "/api/publications/" + "f" * 40)
    assert status == 400
    assert body["error"]["type"] == "NOT_FOUND"


def test_unknown_route_and_sessions(served):
    base, _, summary = served
    status, body = _get(base + "/api/nope")
    assert status == 404 and body["error"]["type"] == "NOT_FOUND"
    status, body = _get(base + "/api/sessions")
    assert status == 200
    assert [s["id"] for s in body["results"]] == [summary.session_id]
    assert body["results"][0]["stoppedReason"] == summary.stopped_reason
    assert body["meta"]["total"] == 1 and body["meta"]["limit"] == 50
    # paging: an offset past the data yields an empty page, same meta total
    status, body = _get(base + "/api/sessions?page=2&limit=1")
    assert status == 200 and body["results"] == []
    assert body["meta"]["total"] == 1
    # parseInt parity: trailing garbage on a numeric param is accepted
    status, body = _get(base + "/api/sessions?limit=1abc")
    assert status == 200 and body["meta"]["limit"] == 1
