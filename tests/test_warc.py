"""WARC source/sink round-trip (ISO 28500): distributed export of the
synthetic corpus to per-partition .warc.gz segments, binaryFile read-back
parity, deterministic record ids, and a crawl driven off the WARC-read
corpus identical to the parquet-corpus crawl."""

import gzip

import pytest
import pyspark.sql.functions as F

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.fetcher import CorpusFetcher
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner
from ethos_spark.session import get_spark
from ethos_spark.sources.config import SYNTH_SOURCE
from ethos_spark.sources.warc import read_warc, record_id, write_warc
from ethos_spark.synth import build_pages_df, listing_url


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-warc", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = build_pages_df(spark, 3, 45).cache()
    df.count()
    return df


def test_warc_roundtrip_parity(spark, tmp_path, corpus_df):
    out = str(tmp_path / "warc")
    manifest = write_warc(
        corpus_df.repartition(3, "url"), out
    ).collect()
    assert sum(m.n_records for m in manifest) == corpus_df.count()
    assert all(m.file.endswith(".warc.gz") for m in manifest)

    back = read_warc(spark, out)
    orig = {r.url: bytes(r.html) for r in corpus_df.select("url", "html").collect()}
    got = {r.url: bytes(r.html) for r in back.collect()}
    assert got == orig  # byte-exact payload parity
    # deterministic, spec-shaped record ids
    rids = {r.url: r.record_id for r in back.collect()}
    for url in list(orig)[:5]:
        assert rids[url] == record_id(url)
        assert rids[url].startswith("<urn:uuid:")
    assert all(r.warc_date == "2025-07-01T00:00:00Z" for r in back.collect())


def test_warc_gzip_members_are_per_record(tmp_path, spark, corpus_df):
    """Each record is its own gzip member — the .warc.gz splittability
    contract (readers can resync on member boundaries)."""
    out = str(tmp_path / "warc1")
    manifest = write_warc(corpus_df.coalesce(1), out).collect()
    blob = open(manifest[0].file, "rb").read()
    # count gzip magic headers at member boundaries by walking members
    import io
    import zlib

    n, pos = 0, 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        assert consumed > 0
        pos += consumed
        n += 1
    assert n == manifest[0].n_records


def test_crawl_from_warc_corpus_identical(spark, tmp_path, corpus_df):
    out = str(tmp_path / "warc2")
    write_warc(corpus_df.repartition(2, "url"), out).collect()
    warc_corpus = read_warc(spark, out).select("url", "html")

    def crawl(name, corpus):
        wh = Warehouse(spark, str(tmp_path / name))
        r = CrawlRunner(
            spark, wh, CorpusFetcher(corpus), SYNTH_SOURCE, CrawlOptions()
        )
        r.seed([listing_url(h, 1) for h in range(3)])
        r.run()
        return sorted(
            (x.processed_order, x.url, x.content)
            for x in wh.read("pages").collect()
        )

    assert crawl("wh_parquet", corpus_df) == crawl("wh_warc", warc_corpus)
