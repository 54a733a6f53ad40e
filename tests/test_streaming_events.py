"""Streaming event operators: watermark-windowed aggregation equals the
batch result on a deterministic drain, and the applyInPandasWithState
operator's group state survives a checkpointed restart."""

import datetime as dt

import pytest

from ethos_spark.session import get_spark
from ethos_spark.streaming.events_stream import (
    drain_to_memory,
    read_events_stream,
    user_running_totals,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-stream-ev", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _events_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, uid, et, v, "{}")
            for i, (ts, uid, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_windowed_counts_equal_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (t0, 1, "click", 1.0),
        (t0 + dt.timedelta(hours=5), 2, "click", 2.5),
        (t0 + dt.timedelta(days=1), 1, "buy", 10.0),
        (t0 + dt.timedelta(days=1, hours=2), 3, "click", 0.25),
    ]
    src = str(tmp_path / "ev")
    _events_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(src)
    out = drain_to_memory(
        windowed_event_counts(read_events_stream(spark, src))
    ).collect()
    got = {(r.day, r.event_type): (r.n_events, r.sum_value_u) for r in out}
    assert got == {
        ("2024-03-01", "click"): (2, 35000),
        ("2024-03-02", "buy"): (1, 100000),
        ("2024-03-02", "click"): (1, 2500),
    }


def test_stateful_totals_resume_from_checkpoint(spark, tmp_path):
    """applyInPandasWithState keeps per-user state in the checkpoint: a
    restarted query over NEW files continues the running totals."""
    src = str(tmp_path / "ev2")
    cp = str(tmp_path / "cp")
    t0 = dt.datetime(2024, 3, 1)

    def run_drain(name):
        # memory sink cannot recover from a checkpoint; foreachBatch can
        acc = {}

        def sink(df, _bid):
            for r in df.collect():
                acc[r.user_id] = (r.n_events, r.sum_value_u)

        q = (
            user_running_totals(read_events_stream(spark, src))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return acc

    batch1 = _events_df(
        spark, [(t0, 1, "click", 1.0), (t0, 1, "click", 2.0), (t0, 2, "buy", 5.0)]
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    first = run_drain("totals_a")
    assert first[1] == (2, 30000) and first[2] == (1, 50000)

    batch2 = _events_df(spark, [(t0, 1, "buy", 4.0), (t0, 3, "click", 7.0)])
    batch2.coalesce(1).write.mode("append").parquet(src)
    second = run_drain("totals_b")
    # user 1 CONTINUES from stored state (2+1 events, 3.0+4.0); user 3 fresh;
    # user 2 had no new events -> no new emission in update mode
    assert second[1] == (3, 70000)
    assert second[3] == (1, 70000)
    assert 2 not in second
