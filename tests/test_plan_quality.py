"""Physical-plan quality gates for the round-2 operators: shuffle budgets,
pushdown, and broadcast shapes — the .explain discipline as assertions so
regressions fail loudly instead of silently doubling shuffles."""

import pytest

from ethos_spark.plans.explain import (
    count_exchanges,
    read_schema_columns,
    scan_pushed_filters,
)
from ethos_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-planq", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_minhash_lsh_shuffle_budget(spark):
    """The restructured LSH pipeline stays within its shuffle budget
    (collect_set build + band self-join + pair dedup + 2 verify joins +
    final sort, ≤9 incl. AQE-inserted exchanges; the old shape had ~13)."""
    import __spark_entry__ as E

    df = E.queries()["dedup_minhash_lsh"](spark, SF)
    assert count_exchanges(df) <= 9, f"got {count_exchanges(df)} exchanges"


def test_publications_pushdown(spark):
    """Serve filters reach the parquet scan (PushedFilters), and the page
    projection prunes the documents scan to the selected columns."""
    import pyspark.sql.functions as F

    from ethos_spark.serve.queries import PublicationsQuery, publications

    pages = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("id"),
        F.col("source"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("crawled_at"),
        F.lit("2025-01-01").alias("published_date"),
    )
    rows, _ = publications(
        pages, PublicationsQuery(source="wiki", order_by="published_date")
    )
    pushed = scan_pushed_filters(rows)
    assert "source" in pushed, pushed


def test_token_counts_column_pruning(spark):
    """A 2-column projection must not read the whole documents schema."""
    import __spark_entry__ as E

    df = E.queries()["token_counts"](spark, SF)
    cols = set(read_schema_columns(df))
    # only the projection's inputs are read — lang/source/n_chars pruned
    assert cols <= {"doc_id", "text"}, cols


def test_ivf_probe_is_broadcast(spark):
    """IVF probing joins the tiny probe set via broadcast — the corpus
    side must not shuffle on the list key."""
    from ethos_spark.ops import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ann = sim.ivf_ann_topk(emb, [0, 1, 2], k=3, n_clusters=8, nprobe=2)
    from ethos_spark.plans.explain import formatted_plan

    plan = formatted_plan(ann)
    assert "BroadcastHashJoin" in plan
