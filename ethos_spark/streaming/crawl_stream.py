"""Streaming crawl ingestion: seed URLs arrive as a STREAM, each
micro-batch drives a full crawl session through ``foreachBatch`` (round-3
VERDICT item 10).

The batch crawl loop (crawl/runner.py) is already micro-batch shaped —
one round per frontier snapshot, committed atomically. This module lifts
it into Structured Streaming for the standing-service deployment: a
long-lived query watches a seed source (file drop-box here; Kafka topic
of discovered feeds in production), and every arriving batch of seed URLs
runs an incremental crawl session against the shared warehouse.

Reference analogue: the CLI reference runs one session per invocation
(src/index.ts); a scheduler invoking it per new-source event is exactly
this query. Using ``foreachBatch`` (not a built-in sink) is deliberate:

- the crawl writes MULTIPLE tables atomically via the warehouse manifest
  — no single-sink contract fits;
- restart safety comes from idempotence, not exactly-once sinks: a
  replayed batch re-seeds URLs whose pages already exist, and the
  dedup anti-join ends the session immediately as ``all_duplicates``
  (the reference's incremental-recrawl semantics) — nothing is stored
  twice. The checkpoint only has to bound the replay window.

Scale shape: seed batches are metadata-sized (a feed list, not a corpus),
so the one ``collect()`` here is bounded by construction; everything
downstream is the distributed round DAG of CrawlRunner.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ethos_spark.catalog import Warehouse
from ethos_spark.crawl.runner import CrawlOptions, CrawlRunner, CrawlSummary
from ethos_spark.sources.config import SourceConfig

# deterministic epoch for batch-session ids (no wall clock in the data
# path: session identity must be a function of the batch, so a replayed
# batch maps to the SAME session id and upserts its row instead of
# appending a sibling)
_EPOCH = datetime(2025, 7, 1, tzinfo=timezone.utc)


def crawl_batch_handler(
    spark: SparkSession,
    warehouse_path: str,
    fetcher_factory: Callable[[], object],
    config: SourceConfig,
    options: CrawlOptions | None = None,
    on_summary: Callable[[int, CrawlSummary], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: (seed batch, batch_id) → one
    incremental crawl session on the shared warehouse.

    ``fetcher_factory`` is called per batch — fetchers may hold
    per-session state (staged tables, HTTP pools) that must not leak
    across sessions. ``on_summary`` receives each session's CrawlSummary
    (metrics hook; tests use it)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # seeds are metadata-sized by contract (see module docstring)
        urls = [
            r.url
            for r in batch_df.select("url").distinct().orderBy("url").collect()
        ]
        if not urls:
            return
        wh = Warehouse(spark, warehouse_path)
        runner = CrawlRunner(
            spark,
            wh,
            fetcher_factory(),
            config,
            options,
            start_time=_EPOCH + timedelta(seconds=int(batch_id)),
        )
        # kill-mid-batch recovery: session ids are a deterministic
        # function of batch_id, so a replayed batch can tell whether its
        # OWN session died mid-flight (sessions row exists, end_time not
        # set, warehouse loop state still pinned to it). Then it RESUMES
        # from the last committed round — CrawlRunner resume parity makes
        # the final warehouse byte-identical to an uninterrupted run —
        # instead of re-seeding (which would restart processed_order).
        # A replay of a COMPLETED batch still re-seeds and ends
        # immediately as all_duplicates (idempotence, as before).
        mine = next(
            (
                r
                for r in wh.read_rows("sessions")
                if r.get("id") == runner.session_id
            ),
            None,
        )
        if (
            mine is not None
            and mine.get("end_time") is None
            and wh.props.get("session_id") == runner.session_id
        ):
            runner.resume()
        else:
            runner.seed(urls)
        summary = runner.run()
        if on_summary is not None:
            on_summary(batch_id, summary)

    return handle


def run_crawl_stream(
    seeds: DataFrame,
    warehouse_path: str,
    fetcher_factory: Callable[[], object],
    config: SourceConfig,
    options: CrawlOptions | None = None,
    checkpoint: str | None = None,
    on_summary: Callable[[int, CrawlSummary], None] | None = None,
):
    """Start the standing crawl query over a streaming ``seeds`` frame
    (must contain a ``url`` string column). Returns the StreamingQuery;
    callers drive it with ``processAllAvailable()`` (tests) or let it run
    (service)."""
    handler = crawl_batch_handler(
        seeds.sparkSession,
        warehouse_path,
        fetcher_factory,
        config,
        options,
        on_summary,
    )
    w = seeds.writeStream.foreachBatch(handler).outputMode("append")
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
