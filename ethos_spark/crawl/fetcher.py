"""Fetch stage: attach page bytes to scheduled frontier rows.

The reference fetches with a headless browser (BrowserHandler.ts:13-68);
no network exists in this sandbox, so the default fetcher resolves URLs
against the synthetic corpus table — the same join shape a WARC-backed
fetch would use at 100 TB (url-keyed lookup into the pages store). A real
HTTP fetcher slots in behind the same interface as a ``mapInPandas``
stage over host-partitioned batches (SURVEY.md §7.3 "No real network").
"""

from __future__ import annotations

import time
from typing import Iterator, Protocol

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class Fetcher(Protocol):
    def fetch(self, candidates: DataFrame, size_hint: int | None = None) -> DataFrame:
        """candidates (must contain ``url``) → same rows + ``html`` binary
        (NULL = fetch failure) + ``fetch_ms`` double per-row amortized.
        ``size_hint``: caller-known upper bound on the candidate row count
        (the politeness window size) — lets the fetcher pick broadcast vs
        shuffle join without an extra count job."""
        ...


class CorpusFetcher:
    """Deterministic lookup into a corpus DataFrame (url, html).

    ``host_partitioned = False``: output partitioning is the corpus scan
    (host-agnostic, balanced) — no hot-host salting needed downstream.

    Join strategy is SIZE-GATED: when the caller's ``size_hint`` says the
    round's candidate set is small (≤ ``broadcast_max_rows``), the
    candidate side is broadcast so the corpus scan stays partition-local
    and the html column never shuffles. Above the gate — the design point
    is millions of URLs per round, where a forced broadcast of every
    scheduled URL is a driver/executor OOM — it falls back to a plain
    url-keyed equi-join and lets Catalyst/AQE pick the physical strategy
    (both sides hash-partition on the join key; at production scale the
    corpus and frontier would be bucketed on url_hash to make this
    shuffle-free). With no hint, the safe shuffle path is used.
    """

    host_partitioned = False
    # inner-join contract: fetch-miss candidates are DROPPED from the
    # output (the caller reconstructs them via a cheap anti-join). The
    # outer-join alternative forces a sort-merge join that shuffles every
    # fetched html body onto shuffle.partitions tasks — measured to
    # serialize the extract stage.
    returns_misses = False

    def __init__(
        self,
        corpus: DataFrame,
        broadcast_candidates: bool = True,
        broadcast_max_rows: int = 200_000,
    ):
        self._corpus = corpus.select("url", "html")
        self._broadcast = broadcast_candidates
        self._broadcast_max = broadcast_max_rows

    def fetch(self, candidates: DataFrame, size_hint: int | None = None) -> DataFrame:
        cand = candidates
        if (
            self._broadcast
            and size_hint is not None
            and size_hint <= self._broadcast_max
        ):
            # corpus ⋈ broadcast(url-set) ⋈ broadcast(candidate cols):
            # the html column never shuffles; output keeps the corpus
            # scan's partitioning
            hits = self._corpus.join(
                F.broadcast(cand.select("url").distinct()), "url"
            )
            out = hits.join(F.broadcast(cand), "url")
        else:
            out = cand.join(self._corpus, "url")
        return out.withColumn("fetch_ms", F.lit(0.0))


class HttpFetcher:
    """Real-network fetcher skeleton (NOT usable in this sandbox: no network,
    no HTTP client beyond stdlib). Kept to pin the production shape: an
    Arrow-batched ``mapInPandas`` over host-partitioned candidates, one
    session per host per partition, politeness delay between requests."""

    host_partitioned = True  # batches arrive grouped by host (politeness)
    returns_misses = True  # every candidate row comes back (html NULL on fail)

    def __init__(self, timeout_sec: float = 60.0, delay_sec: float = 1.0):
        self.timeout_sec = timeout_sec
        self.delay_sec = delay_sec

    def fetch(self, candidates: DataFrame, size_hint: int | None = None) -> DataFrame:
        timeout, delay = self.timeout_sec, self.delay_sec
        # enforce the host_partitioned contract: hash-partition on host so
        # one host's URLs land in one task and the per-request delay
        # actually serializes requests to that host (politeness guarantee
        # the flag advertises); without this the candidates arrive on
        # whatever partitioning the frontier scan produced
        if "host" in candidates.columns:
            candidates = candidates.repartition(F.col("host"))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import urllib.request

            for pdf in batches:
                htmls, times = [], []
                for url in pdf["url"]:
                    t0 = time.monotonic()
                    try:
                        with urllib.request.urlopen(url, timeout=timeout) as r:
                            htmls.append(r.read())
                    except Exception:
                        htmls.append(None)
                    times.append((time.monotonic() - t0) * 1000.0)
                    time.sleep(delay)
                pdf = pdf.copy()
                pdf["html"] = htmls
                pdf["fetch_ms"] = times
                yield pdf

        import pyspark.sql.types as T

        schema = T.StructType(
            candidates.schema.fields
            + [T.StructField("html", T.BinaryType()),
               T.StructField("fetch_ms", T.DoubleType())]
        )
        return candidates.mapInPandas(run, schema)
