"""Streaming exact deduplication over a document stream.

The batch pipeline dedups a corpus snapshot (ops/dedup.py); an INGEST
pipeline sees documents arrive continuously and must drop repeats online
— re-crawls, mirrors, syndicated copies — before they reach storage.
Spark-first shape: a file-source stream → normalized-text digest →
``dropDuplicates`` keyed on the digest, state kept by the engine in the
checkpointed state store, so a restart resumes with every digest seen so
far (no re-emission across restarts; verified in
tests/test_streaming_dedup.py by feeding files in two micro-batches
around a restart).

Two variants:

- ``streaming_exact_dedup``: unbounded digest state — the exact-dedup
  guarantee the batch op gives, for streams whose key cardinality fits the
  state store (RocksDB-backed in production).
- ``streaming_exact_dedup_within``: ``dropDuplicatesWithinWatermark`` —
  state bounded by an event-time watermark, the 100 TB configuration:
  duplicates practically always arrive near their original (re-crawl
  windows), so expiring digests older than the watermark caps state at
  O(window throughput) instead of O(corpus).

Determinism note: which physical row of a digest-group survives depends on
micro-batch arrival order, but the SET of emitted digests is exactly the
distinct digest set — that is the oracle-checkable projection
(``streaming_dedup_digests`` in __spark_entry__.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ethos_spark.ops.dedup import normalized

DOCUMENTS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_stream(
    spark: SparkSession, path: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over document parquet files (new files = new
    micro-batches)."""
    return (
        spark.readStream.schema(DOCUMENTS_DDL)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def with_digest(docs: DataFrame) -> DataFrame:
    """Attach the exact-dedup key: md5 of whitespace-normalized text —
    the same digest the batch ``exact_dedup`` groups on, so the streaming
    and batch paths agree on what a duplicate is."""
    return docs.withColumn("digest", F.md5(normalized(F.col("text"))))


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """First-arrival-wins exact dedup: one output row per distinct digest,
    digest state unbounded (checkpoint-persisted across restarts)."""
    return with_digest(docs).dropDuplicates(["digest"])


def streaming_exact_dedup_within(
    docs: DataFrame, ts_col: str, window: str = "7 days"
) -> DataFrame:
    """Watermark-bounded exact dedup: digests expire ``window`` after
    their event time, capping state for unbounded corpora. A duplicate
    arriving later than the window is emitted again — the documented
    recall trade every production near-line dedup makes."""
    return (
        with_digest(docs)
        .withWatermark(ts_col, window)
        .dropDuplicatesWithinWatermark(["digest"])
    )
