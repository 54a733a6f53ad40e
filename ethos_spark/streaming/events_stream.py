"""Structured Streaming operators over the events table.

Two capabilities the north rule's "custom operators" tier asks for, both
expressed so a deterministic drain (``trigger(availableNow=True)``) equals
the batch aggregation — which makes even the STREAMING paths
oracle-checkable against DuckDB SQL:

- event-time tumbling window + watermark (the built-in windowed-agg path):
  1-day windows over ``ts`` with a 1-hour watermark for late events; on a
  complete drain the result equals ``GROUP BY date_trunc('day', ts)``.
- ``applyInPandasWithState`` (the CUSTOM stateful-operator path): per-user
  running totals kept in explicit group state across micro-batches;
  restart-with-checkpoint resumes from the stored state (tested in
  tests/test_streaming_events.py by feeding the files in two batches).

Float convention: monetary sums are emitted as ``round(sum * 1e4)``:
the source values carry exactly 2 decimals, so the true scaled sum IS an
integer and both engines' floats land within ±ε of it — round() is stable
there while floor() flips on the sign of ε (a measured off-by-one).
round-half rules can't differ because exact .5 cannot occur.
"""

from __future__ import annotations

import uuid
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over event parquet files (new files = new
    micro-batches). ``glob`` narrows the match when the directory holds
    other tables (the driver's sf dirs: pass "events*.parquet")."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """1-day tumbling event-time windows with a 1-hour watermark:
    (day, event_type, n_events, sum_value_u)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 1e4, 0).cast("long").alias("sum_value_u"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_value_u",
        )
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user cumulative (n_events, value sum)
    held in explicit group state (applyInPandasWithState). Each micro-batch
    updates the state and emits the user's NEW running total — on a full
    drain the last emission per user equals the batch aggregate."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value_u": [int(round(v * 1e4))],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, sum_value_u long",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def drain_to_memory(agg: DataFrame, complete: bool = True) -> DataFrame:
    """Run the streaming plan over all currently-available files
    (availableNow trigger → deterministic) into an in-memory sink and
    return the sink as a DataFrame."""
    name = f"drain_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)
