"""Warehouse snapshot-catalog units: crash-orphan GC, manifest row
tables, restore semantics."""

import os

import pytest

from ethos_spark.catalog import Warehouse
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-catalog", master="local[2]", shuffle_partitions=2)
    yield s
    s.stop()


def test_orphan_gc_after_crash(spark, tmp_path):
    """append-without-commit (simulated crash) leaves an orphan dir that a
    reopened warehouse GCs; committed data and re-runs are unaffected."""
    path = str(tmp_path / "wh")
    wh = Warehouse(spark, path)
    df = spark.range(5).selectExpr("id")
    wh.append("t", df)
    wh.commit("c1")
    assert len(os.listdir(os.path.join(path, "t"))) == 1

    crasher = Warehouse(spark, path)
    crasher.append("t", df)  # staged, never committed
    assert len(os.listdir(os.path.join(path, "t"))) == 2
    del crasher

    wh2 = Warehouse(spark, path)
    removed = wh2.gc_orphans()
    assert len(removed) == 1
    assert len(os.listdir(os.path.join(path, "t"))) == 1
    assert wh2.read("t").count() == 5
    # the re-run of the 'crashed' write commits cleanly, no duplicates
    wh2.append("t", df)
    wh2.commit("c2")
    assert wh2.read("t").count() == 10


def test_row_tables_roundtrip(spark, tmp_path):
    from datetime import datetime, timezone

    from ethos_spark import schemas  # registers the sessions row schema

    wh = Warehouse(spark, str(tmp_path / "whr"))
    t0 = datetime(2025, 7, 1, tzinfo=timezone.utc)
    wh.upsert_rows(
        "sessions",
        {
            "id": "s1", "source_id": "x", "source_name": "X",
            "start_time": t0, "end_time": None,
            "metadata": "{}", "stopped_reason": None,
        },
        key="id",
    )
    wh.commit("one")
    # upsert same key replaces, new key appends; survives reopen
    wh.upsert_rows(
        "sessions",
        {
            "id": "s1", "source_id": "x", "source_name": "X",
            "start_time": t0, "end_time": t0,
            "metadata": "{}", "stopped_reason": "max_pages",
        },
        key="id",
    )
    wh.upsert_rows(
        "sessions",
        {
            "id": "s2", "source_id": "y", "source_name": "Y",
            "start_time": t0, "end_time": None,
            "metadata": "{}", "stopped_reason": None,
        },
        key="id",
    )
    wh.commit("two")
    wh2 = Warehouse(spark, wh.path)
    rows = {r.id: r for r in wh2.read("sessions").collect()}
    assert set(rows) == {"s1", "s2"}
    assert rows["s1"].stopped_reason == "max_pages"
    assert rows["s1"].end_time is not None  # timestamp round-trip
    # replace (admin-delete path) over a row table
    import pyspark.sql.functions as F

    wh2.replace("sessions", wh2.read("sessions").where(F.col("id") != "s1"))
    wh2.commit("del")
    assert [r.id for r in wh2.read("sessions").collect()] == ["s2"]
    # restore rewinds row tables with the rest of the snapshot
    wh2.restore("two")
    assert {r.id for r in wh2.read("sessions").collect()} == {"s1", "s2"}


def test_legacy_parquet_folds_into_row_table(spark, tmp_path):
    """A pre-row-table warehouse holds sessions as parquet dirs; the first
    upsert_rows must fold those rows into the manifest row table instead of
    shadowing them (ADVICE r2: catalog.py migration gap)."""
    from datetime import datetime, timezone

    from ethos_spark import schemas

    wh = Warehouse(spark, str(tmp_path / "whl"))
    t0 = datetime(2025, 7, 1, tzinfo=timezone.utc)
    legacy = spark.createDataFrame(
        [("old1", "x", "X", t0, t0, "{}", "max_pages")], schemas.SESSIONS
    )
    # simulate the legacy layout: sessions as a parquet append table
    wh.append("sessions", legacy)
    wh.commit("legacy")
    wh2 = Warehouse(spark, wh.path)
    # legacy rows visible through the fallthrough before any row write
    assert [r.id for r in wh2.read("sessions").collect()] == ["old1"]
    wh2.upsert_rows(
        "sessions",
        {
            "id": "new1", "source_id": "y", "source_name": "Y",
            "start_time": t0, "end_time": None,
            "metadata": "{}", "stopped_reason": None,
        },
        key="id",
    )
    wh2.commit("migrated")
    rows = {r.id: r for r in Warehouse(spark, wh.path).read("sessions").collect()}
    assert set(rows) == {"old1", "new1"}  # history preserved
    assert rows["old1"].stopped_reason == "max_pages"
    assert rows["old1"].start_time is not None
