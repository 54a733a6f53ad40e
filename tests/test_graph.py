"""Integer PageRank (ops/graph.py): known-graph sanity + determinism."""

import pytest

from ethos_spark.ops.graph import pagerank_fixed
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-graph", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_cycle_is_uniform_and_star_centers(spark):
    # 3-cycle: perfect symmetry -> equal ranks every iteration
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    r = {x.node: x.rank for x in pagerank_fixed(cyc, iters=4).collect()}
    assert len(set(r.values())) == 1

    # in-star: all leaves point at the (dangling) center -> center rank
    # strictly highest every iteration
    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    rows = pagerank_fixed(star, iters=4).collect()
    assert rows[0].node == 0
    assert rows[0].rank > max(x.rank for x in rows[1:])


def test_rank_mass_bounded_and_deterministic(spark):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7) for i in range(30)], "src long, dst long"
    )
    a = [(x.node, x.rank) for x in pagerank_fixed(edges, iters=5).collect()]
    b = [(x.node, x.rank) for x in pagerank_fixed(edges, iters=5).collect()]
    assert a == b
    total = sum(r for _n, r in a)
    assert 0 < total <= 1_000_000_000_000  # floor losses only shrink mass


def test_empty_and_self_loop_only_graphs(spark):
    """ADVICE r4: scale // n_nodes must not ZeroDivisionError when the
    edge set is empty or all edges are self-loops."""
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed(empty, iters=2).collect() == []
    loops = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "src string, dst string"
    )
    assert pagerank_fixed(loops, iters=2).collect() == []
