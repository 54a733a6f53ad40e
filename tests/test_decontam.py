"""Benchmark decontamination (ops/decontam.py): planted eval-set
overlap flags exactly the contaminated docs; decontaminate() drops them
and nothing else."""

import pytest
import pyspark.sql.functions as F

from ethos_spark.ops.decontam import contamination_report, decontaminate
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-decontam", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_planted_overlap_flagged_and_dropped(spark):
    mk = lambda i, t: (i, t)
    docs = spark.createDataFrame(
        [
            mk(1, "alpha " + " ".join(f"w{j}" for j in range(20)) + " omega"),
            mk(2, "totally unrelated text " + " ".join(f"u{j}" for j in range(20))),
            mk(3, "short doc"),
        ],
        "doc_id long, text string",
    )
    # benchmark shares a 13-gram with doc 1 only (w3..w15)
    bench = spark.createDataFrame(
        [(100, " ".join(f"w{j}" for j in range(3, 16)))],
        "doc_id long, text string",
    )
    rep = {
        r.doc_id: r.n_contaminated_grams
        for r in contamination_report(docs, bench, n=13).collect()
    }
    assert rep == {1: 1}
    kept = sorted(
        r.doc_id for r in decontaminate(docs, bench, n=13).collect()
    )
    assert kept == [2, 3]

    # sub-n-word docs compare by their full (short) gram — doc 3 is only
    # flagged when the benchmark contains exactly that text
    bench2 = spark.createDataFrame(
        [(101, "  SHORT   doc ")], "doc_id long, text string"
    )
    rep2 = {
        r.doc_id: r.n_contaminated_grams
        for r in contamination_report(docs, bench2, n=13).collect()
    }
    assert rep2 == {3: 1}  # normalization: case + whitespace collapse
