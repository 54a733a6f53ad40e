"""Generic outlink extraction: every ``<a href>`` of a page, resolved
against the page URL and canonicalized — the raw material of the host
link graph when no per-source listing config exists (the open-web
PageRank input, versus the configured-chain edges the crawl runner
accumulates in ``link_edges``).

Scale shape: one Arrow-batched ``mapInPandas`` over (url, html) — the
UDTF one-row-in/many-out shape of the listing extractor; html never
shuffles (extraction rides the fetch/scan partitioning), and the
host-graph aggregation downstream touches only light (src_host,
dst_host) rows. Reuses the stdlib DOM (extraction/html.py) and the
fuzz-pinned URL resolve/canonicalize kernels (functions/urlfns.py)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

OUTLINK_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("href", T.StringType()),  # raw attribute value
        T.StructField("url", T.StringType()),  # resolved + canonicalized
    ]
)


def extract_page_outlinks(page_url: str, html: str) -> list[tuple[str, str]]:
    """Pure kernel: (raw href, resolved+canonical url) for every anchor
    with a non-empty href. fragment-only / unresolvable hrefs drop (the
    lenient-resolve contract)."""
    from ethos_spark.extraction.html import parse_html
    from ethos_spark.functions.urlfns import (
        canonicalize_url,
        resolve_url_lenient,
    )

    out: list[tuple[str, str]] = []
    root = parse_html(html)
    for el in root.iter_elements():
        if el.tag != "a":
            continue
        href = (el.get("href") or "").strip()
        if not href or href.startswith("#"):
            continue
        resolved = resolve_url_lenient(href, page_url)
        if resolved is None:
            continue
        out.append((href, canonicalize_url(resolved)))
    return out


def extract_outlinks(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) rows → exploded (src_url, href, url) outlink rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, hrefs, urls = [], [], []
            for src, body in zip(pdf[url_col], pdf[html_col]):
                if body is None:
                    continue
                html = (
                    bytes(body).decode("utf-8", "replace")
                    if not isinstance(body, str)
                    else body
                )
                for href, resolved in extract_page_outlinks(src, html):
                    srcs.append(src)
                    hrefs.append(href)
                    urls.append(resolved)
            yield pd.DataFrame(
                {"src_url": srcs, "href": hrefs, "url": urls}
            )

    return df.select(url_col, html_col).mapInPandas(run, OUTLINK_SCHEMA)


def host_link_graph(outlinks: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the PageRank input, self-links
    dropped. Pure Column host extraction (no UDF)."""
    host = lambda c: F.lower(
        F.regexp_extract(F.col(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    return (
        outlinks.select(
            host("src_url").alias("src_host"), host("url").alias("dst_host")
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
        .orderBy("src_host", "dst_host")
    )
