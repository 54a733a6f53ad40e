"""Every queries() entry must match its DuckDB oracle at sf0.001 — the
local mirror of the driver's CORRECTNESS gate."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as E  # noqa: E402
from oracle_harness import duck_connection, compare  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from ethos_spark.session import get_spark

    s = get_spark("test-oracle", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = E.queries()[name]
    oracles = E.oracle_sql()
    df = fn(spark, SF)
    if name not in oracles:
        assert df.count() >= 0  # rows-only contract for non-SQL ops
        return
    ok, msg = compare(df, con, oracles[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "quality_score", "lang_pred"}
