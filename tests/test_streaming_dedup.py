"""Streaming exact dedup: engine-managed digest state drops repeats
across micro-batches AND across a checkpointed restart; the watermark
variant expires state and re-admits late duplicates (the documented
trade)."""

import datetime as dt

import pytest
import pyspark.sql.functions as F

from ethos_spark.session import get_spark
from ethos_spark.streaming.dedup_stream import (
    read_documents_stream,
    streaming_exact_dedup,
    streaming_exact_dedup_within,
    with_digest,
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-stream-dd", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _docs_df(spark, rows):
    """rows: (doc_id, text)"""
    return spark.createDataFrame(
        [(i, t, "en", "srcA", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_dedup_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "docs")
    cp = str(tmp_path / "cp")

    def run_drain():
        seen = []

        def sink(df, _bid):
            seen.extend((r.doc_id, r.digest) for r in df.collect())

        q = (
            streaming_exact_dedup(read_documents_stream(spark, src))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return seen

    _docs_df(
        spark, [(1, "alpha beta"), (2, "gamma"), (3, "alpha   beta")]
    ).coalesce(1).write.mode("append").parquet(src)
    first = run_drain()
    # doc 3 normalizes to doc 1's text -> one survivor per digest
    assert len(first) == 2
    assert {d for d, _ in first} <= {1, 2, 3}

    # restart with NEW files: old digests still held in checkpoint state
    _docs_df(
        spark, [(10, "ALPHA BETA"), (11, "gamma"), (12, "delta")]
    ).coalesce(1).write.mode("append").parquet(src)
    second = run_drain()
    # 'gamma' is a repeat across the restart -> dropped; 'ALPHA BETA'
    # differs after lowercasing-normalization? no: normalized() lowercases,
    # so it is ALSO a repeat; only 'delta' is new
    assert [d for d, _ in second] == [12]


def test_digest_set_equals_batch_distinct(spark, tmp_path):
    src = str(tmp_path / "docs2")
    rows = [(i, f"text {i % 7}") for i in range(50)]
    _docs_df(spark, rows).coalesce(2).write.mode("overwrite").parquet(src)

    from ethos_spark.streaming.events_stream import drain_to_memory

    out = drain_to_memory(
        streaming_exact_dedup(read_documents_stream(spark, src)),
        complete=False,
    )
    got = {r.digest for r in out.select("digest").collect()}
    want = {
        r.digest
        for r in with_digest(spark.read.parquet(src))
        .select("digest")
        .distinct()
        .collect()
    }
    assert got == want and len(got) == 7


def test_watermark_variant_builds_and_drains(spark, tmp_path):
    """dropDuplicatesWithinWatermark: same-window duplicates dropped on a
    single drain (full expiry semantics need wall-clock batches; the
    bounded-state CONFIG is what this pins)."""
    src = str(tmp_path / "docs3")
    t0 = dt.datetime(2024, 5, 1)
    df = _docs_df(
        spark, [(1, "one"), (2, "one"), (3, "two")]
    ).withColumn(
        "ts", F.lit(t0).cast("timestamp")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ts timestamp"
        )
        .parquet(src)
    )
    from ethos_spark.streaming.events_stream import drain_to_memory

    out = drain_to_memory(
        streaming_exact_dedup_within(stream, "ts", "7 days"), complete=False
    )
    assert out.count() == 2  # 'one' deduped within the watermark window
