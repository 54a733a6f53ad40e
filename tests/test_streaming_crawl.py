"""foreachBatch streaming crawl (VERDICT r3 item 10): seed URLs arrive as
a file-source stream; each micro-batch runs an incremental crawl session
against the shared warehouse. Asserts batch-vs-streaming output parity,
incremental dedup across batches, and idempotent batch replay after a
checkpointed restart."""

import json
import os

import pytest
import pyspark.sql.functions as F

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.streaming.crawl_stream import run_crawl_stream
from ethos_spark.synth import build_pages_df, listing_url

N_HOSTS, N_ARTICLES = 3, 45


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-stream-crawl", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = build_pages_df(spark, N_HOSTS, N_ARTICLES).cache()
    df.count()
    return df


def _drop_seeds(seed_dir, name, urls):
    p = os.path.join(seed_dir, name + ".tmp")
    with open(p, "w") as f:
        for u in urls:
            f.write(json.dumps({"url": u}) + "\n")
    os.replace(p, os.path.join(seed_dir, name + ".json"))


def _stream(spark, seed_dir):
    return (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .json(seed_dir)
    )


def test_streaming_crawl_parity_incremental_and_replay(
    spark, tmp_path, corpus_df
):
    seed_dir = str(tmp_path / "seeds")
    ckpt = str(tmp_path / "ckpt")
    wh_path = str(tmp_path / "wh_stream")
    os.makedirs(seed_dir)
    summaries = {}

    def start():
        return run_crawl_stream(
            _stream(spark, seed_dir),
            wh_path,
            lambda: CorpusFetcher(corpus_df),
            SYNTH_SOURCE,
            CrawlOptions(),
            checkpoint=ckpt,
            on_summary=lambda bid, s: summaries.setdefault(bid, s),
        )

    # batch 0: host 0 only
    _drop_seeds(seed_dir, "b0", [listing_url(0, 1)])
    q = start()
    q.processAllAvailable()

    wh = Warehouse(spark, wh_path)
    n_host0 = wh.read("pages").count()
    assert n_host0 > 0
    # parity with a plain batch crawl of the same seed
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    r = CrawlRunner(
        spark, wh_ref, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions()
    )
    r.seed([listing_url(0, 1)])
    r.run()
    a = sorted(
        (x.processed_order, x.url, x.content)
        for x in wh.read("pages").collect()
    )
    b = sorted(
        (x.processed_order, x.url, x.content)
        for x in wh_ref.read("pages").collect()
    )
    assert a == b

    # batch 1: host 0 again (pure re-seed -> all_duplicates, nothing new)
    # + host 1 (fresh crawl)
    _drop_seeds(seed_dir, "b1", [listing_url(0, 1)])
    _drop_seeds(seed_dir, "b2", [listing_url(1, 1)])
    q.processAllAvailable()
    q.stop()

    wh = Warehouse(spark, wh_path)
    n_after = wh.read("pages").count()
    assert n_after > n_host0  # host 1 crawled
    re_seed = [s for s in summaries.values()
               if s.stopped_reason == "all_duplicates"]
    assert re_seed and re_seed[0].items_processed == 0
    hosts = {r.host for r in wh.read("pages").select("host").collect()}
    assert hosts == {"news-0.example.org", "news-1.example.org"}

    # restart from the checkpoint: already-processed seed files must not
    # produce new pages (committed offsets + idempotent re-crawl)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert Warehouse(spark, wh_path).read("pages").count() == n_after


def test_streaming_crawl_through_warc_gateway(spark, tmp_path, corpus_df):
    """Full production topology in one drive: seed stream -> foreachBatch
    incremental sessions -> HttpFetcher over a real socket -> WARC-backed
    gateway resolving URLs via CDX byte ranges. Output identical to the
    direct corpus crawl of the same seeds."""
    from ethos_spark.crawl.fetcher import HttpFetcher
    from ethos_spark.sources.warc import write_warc
    from tests.corpus_server import WarcGatewayServer

    warc_dir = str(tmp_path / "gw_warc")
    idx = write_warc(
        corpus_df.repartition(2, "url"), warc_dir, with_index=True
    ).collect()
    cdx = {r.url: (r.file, r.offset, r.length) for r in idx}

    seed_dir = str(tmp_path / "gw_seeds")
    os.makedirs(seed_dir)
    wh_path = str(tmp_path / "gw_wh")
    srv = WarcGatewayServer(cdx).start()
    try:
        q = run_crawl_stream(
            _stream(spark, seed_dir),
            wh_path,
            lambda: HttpFetcher(
                timeout_sec=10.0, delay_sec=0.0, gateway=srv.gateway
            ),
            SYNTH_SOURCE,
            CrawlOptions(),
            checkpoint=str(tmp_path / "gw_ckpt"),
        )
        _drop_seeds(seed_dir, "b0", [listing_url(0, 1)])
        q.processAllAvailable()
        _drop_seeds(seed_dir, "b1", [listing_url(1, 1)])
        q.processAllAvailable()
        q.stop()
    finally:
        srv.stop()

    wh_ref = Warehouse(spark, str(tmp_path / "gw_wh_ref"))
    r = CrawlRunner(
        spark, wh_ref, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions()
    )
    r.seed([listing_url(0, 1), listing_url(1, 1)])
    r.run()

    key = lambda w: sorted(
        (x.url, x.content, x.had_extraction_error)
        for x in w.read("pages").collect()
    )
    assert key(Warehouse(spark, wh_path)) == key(wh_ref)
