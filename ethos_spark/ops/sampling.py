"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is rarely trained on whole: pipelines mix sources at
tuned ratios (e.g. 3× wiki, 0.3× crawl). ``Sample.sample(fraction)`` is
non-reproducible across runs/engines, so curation pipelines sample by
HASH: keep a row iff ``H(key) mod M < rate``. Properties that matter at
scale and are all free here:

- **Deterministic & engine-portable**: the shared 56-bit md5 hash
  (``ops.dedup.h56``) computes identically in Spark and DuckDB, so the
  sample is reproducible bit-for-bit and oracle-checkable.
- **No shuffle, no state**: a pure filter — pushes into the scan pipeline,
  composes with pruning, never materializes the population.
- **Stable under growth**: a document keeps/loses membership only based on
  its own key, so incremental corpus appends never resample old rows
  (the property epoch-based training needs).
- **Re-mixable**: a different ``salt`` draws an independent sample (e.g.
  eval holdout vs train split from the same corpus).

The reference engine (a focused web-crawl store) has no sampling surface;
this module is part of the LLM-pipeline extension the brief requires.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ethos_spark.ops.dedup import h56

MOD = 100_000  # rate granularity: 1/100k ≈ 0.001%


def sample_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, MOD) from the shared cross-engine hash.
    DuckDB equivalent (oracle):
    ``('0x' || substr(md5(salt || key), 1, 14))::ubigint % 100000``."""
    return F.pmod(h56(F.concat(F.lit(salt), key.cast("string"))), F.lit(MOD))


def deterministic_sample(
    df: DataFrame, key_col: str, keep_per_100k: int, salt: str = "s0"
) -> DataFrame:
    """Keep ~keep_per_100k / 100k of rows, chosen by key hash — a pure
    filter (no shuffle, no RNG state), reproducible across engines."""
    return df.where(sample_bucket(F.col(key_col), salt) < F.lit(keep_per_100k))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates_per_100k: dict[str, int],
    default_per_100k: int = 0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum rates (source-mixing): rate looked up from an inline
    literal map (strata sets are config-sized — no join, stays a scan-side
    filter; Catalyst folds the map lookup into the pushed predicate
    pipeline)."""
    if rates_per_100k:
        pairs = []
        for k, v in sorted(rates_per_100k.items()):
            pairs += [F.lit(k), F.lit(int(v))]
        rate = F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)], F.lit(default_per_100k)
        )
    else:
        rate = F.lit(default_per_100k)
    return df.where(sample_bucket(F.col(key_col), salt) < rate)


def split(
    df: DataFrame,
    key_col: str,
    holdout_per_100k: int,
    salt: str = "split0",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint (train, holdout) split by key hash: the same key always
    lands on the same side, across runs, engines, and corpus growth."""
    b = sample_bucket(F.col(key_col), salt)
    return (
        df.where(b >= F.lit(holdout_per_100k)),
        df.where(b < F.lit(holdout_per_100k)),
    )
