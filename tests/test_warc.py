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


def test_cdx_index_random_access(spark, tmp_path, corpus_df):
    from ethos_spark.sources.warc import read_warc_record

    out = str(tmp_path / "warc_cdx")
    idx = write_warc(
        corpus_df.repartition(3, "url"), out, with_index=True
    ).collect()
    assert len(idx) == corpus_df.count()
    orig = {r.url: bytes(r.html) for r in corpus_df.select("url", "html").collect()}
    # every record retrievable by byte range, payload byte-exact
    for row in idx[:25]:
        url, payload = read_warc_record(row.file, row.offset, row.length)
        assert url == row.url and payload == orig[row.url]
    # offsets + lengths tile each file exactly (no gaps, no overlap)
    import os
    from collections import defaultdict

    by_file = defaultdict(list)
    for row in idx:
        by_file[row.file].append((row.offset, row.length))
    for f, spans in by_file.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == os.path.getsize(f)


def test_http_crawl_through_warc_gateway(spark, tmp_path, corpus_df):
    """Full production shape: HttpFetcher crawls through a gateway that
    serves from WARC segments via CDX byte-range lookups — output
    identical to the direct corpus crawl."""
    from ethos_spark.crawl.fetcher import HttpFetcher
    from tests.corpus_server import WarcGatewayServer

    out = str(tmp_path / "warc_gw")
    idx = write_warc(
        corpus_df.repartition(2, "url"), out, with_index=True
    ).collect()
    cdx = {r.url: (r.file, r.offset, r.length) for r in idx}

    srv = WarcGatewayServer(cdx).start()
    try:
        wh = Warehouse(spark, str(tmp_path / "wh_warc_gw"))
        r = CrawlRunner(
            spark, wh,
            HttpFetcher(timeout_sec=10.0, delay_sec=0.0, gateway=srv.gateway),
            SYNTH_SOURCE, CrawlOptions(),
        )
        r.seed([listing_url(h, 1) for h in range(3)])
        r.run()
    finally:
        srv.stop()

    wh_ref = Warehouse(spark, str(tmp_path / "wh_warc_gw_ref"))
    rr = CrawlRunner(
        spark, wh_ref, CorpusFetcher(corpus_df), SYNTH_SOURCE, CrawlOptions()
    )
    rr.seed([listing_url(h, 1) for h in range(3)])
    rr.run()
    key = lambda w: sorted(
        (x.processed_order, x.url, x.content, x.had_extraction_error)
        for x in w.read("pages").collect()
    )
    assert key(wh) == key(wh_ref)


def test_partition_order_survives_multiple_arrow_batches(spark, tmp_path, corpus_df):
    """ADVICE r4: file-level url order must hold across Arrow batch
    boundaries (partition-wide sort, not per-batch) — otherwise CDX
    offsets and byte-identical replay silently break at scale."""
    from ethos_spark.sources.warc import _parse_members

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = str(tmp_path / "warc_mb")
        # single partition, 45 rows -> ~7 Arrow batches per partition;
        # shuffle by a NON-url key so batches arrive url-unsorted
        manifest = write_warc(
            corpus_df.repartition(1, F.crc32(F.col("html"))), out
        ).collect()
        assert len(manifest) == 1 and manifest[0].n_records == corpus_df.count()
        with open(manifest[0].file, "rb") as f:
            urls = [u for u, _d, _r, _p in _parse_members(f.read())]
        assert urls == sorted(urls)  # globally ordered within the file
        assert len(urls) == corpus_df.count()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_crlf_url_cannot_forge_warc_headers(spark, tmp_path):
    """ADVICE r4: a crawled URL containing CR/LF must not break record
    framing or inject forged WARC headers."""
    from ethos_spark.sources.warc import _parse_members

    evil = "https://a/x\r\nWARC-Type: evil\r\nX-Forged: 1"
    df = spark.createDataFrame(
        [(evil, bytearray(b"payload-bytes")), ("https://a/ok", bytearray(b"fine"))],
        "url string, html binary",
    )
    out = str(tmp_path / "warc_evil")
    write_warc(df.repartition(1), out).collect()
    back = {r.url: bytes(r.html) for r in read_warc(spark, out).collect()}
    # framing intact: both records survive, payloads exact
    assert back["https://a/ok"] == b"fine"
    assert back["https://a/x%0D%0AWARC-Type:%20evil%0D%0AX-Forged:%201"] == b"payload-bytes"
    # no forged header LINE escaped into any record's header block (the
    # encoded URI still contains the literal text, but never after CRLF)
    import glob
    raw = gzip.decompress(open(glob.glob(out + "/*.warc.gz")[0], "rb").read())
    assert b"\r\nX-Forged" not in raw and b"\r\nWARC-Type: evil" not in raw


def test_non_ascii_url_roundtrips_exactly(spark, tmp_path):
    """Code-review r5: _safe_uri must escape ONLY ASCII controls —
    operating on UTF-8 bytes double-encoded non-ASCII URLs (café →
    cafÃ©) and broke the write→read roundtrip."""
    urls = ["https://ex.org/café", "https://пример.рф/путь", "https://ex.org/日本語"]
    df = spark.createDataFrame(
        [(u, bytearray(f"body-{i}".encode())) for i, u in enumerate(urls)],
        "url string, html binary",
    )
    out = str(tmp_path / "warc_utf8")
    write_warc(df.repartition(1), out).collect()
    back = {r.url: bytes(r.html) for r in read_warc(spark, out).collect()}
    assert set(back) == set(urls)
    assert back["https://ex.org/café"] == b"body-0"
