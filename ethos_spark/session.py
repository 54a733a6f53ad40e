"""SparkSession factory tuned for the engine.

Defaults chosen for the 100 TB target (overridable per caller):
- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on for all pandas-UDF stages, large batches
- shuffle partitions sized to the local test rig; on a real cluster set
  ``spark.sql.shuffle.partitions`` ≈ 2-3× total cores via spark-submit conf
- TZ pinned to UTC (date parity, SURVEY.md §7.3 determinism)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ethos-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else os.cpu_count() or 8
        shuffle_partitions = int(n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan INSIDE cached plans too (off by default): the
        # engine materializes several mid-pipeline caches per crawl round,
        # and without this every one of them runs its shuffles at the full
        # static partition count — no runtime coalescing, one task wave per
        # tiny stage. Scale-adaptive by construction: AQE coalesces toward
        # advisoryPartitionSizeInBytes, so big inputs keep big parallelism.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html rows are ~10-100KB: 10k-row Arrow batches would materialize
        # ~GB pandas frames per worker and thrash the allocator at high
        # concurrency (measured); 1024 keeps batches ~30-100MB
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("ETHOS_ARROW_BATCH", "1024"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("ETHOS_DRIVER_MEM", "8g"))
        .config("spark.locality.wait", "0s")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # smaller splits than the 128MB default: the crawl corpus carries a
        # wide binary html column, and fetch/extract parallelism comes from
        # scan splits (shuffling html to repartition would cost more)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("ETHOS_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
