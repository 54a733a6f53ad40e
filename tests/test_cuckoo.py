"""Cuckoo-filter URL-seen set (crawl/dedup.py CuckooFilter): distributed
sharded build, no false negatives, bounded false positives, EXACT
deletion (the capability the Bloom prefilter lacks), and composition
with the exact anti-join."""

import pytest
import pyspark.sql.functions as F

from ethos_spark.crawl.dedup import CuckooFilter
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-cuckoo", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def filt(spark):
    members = spark.range(20_000).select(
        F.concat(F.lit("https://h/seen-"), F.col("id")).alias("u")
    )
    return CuckooFilter.build(members, "u", expected=20_000, n_shards=8)


def test_no_false_negatives_and_bounded_fp(spark, filt):
    members = spark.range(20_000).select(
        F.concat(F.lit("https://h/seen-"), F.col("id")).alias("u")
    )
    probe = filt.might_contain_udf(spark)
    n_found = members.where(probe(F.col("u"))).count()
    assert n_found == 20_000  # every inserted key found

    others = spark.range(20_000).select(
        F.concat(F.lit("https://h/new-"), F.col("id")).alias("u")
    )
    fp = others.where(probe(F.col("u"))).count()
    assert fp / 20_000 < 0.03, fp  # 16-bit fingerprints, 4-slot buckets


def test_exact_deletion_without_collateral(spark, filt):
    """Delete 500 members: they disappear, the other 19.5k remain — the
    standing-seen-set recrawl-after-clean flow with no rebuild."""
    doomed = [f"https://h/seen-{i}" for i in range(500)]
    assert filt.delete(doomed) == 500
    probe = filt.might_contain_udf(spark)  # fresh broadcast post-delete
    kept = spark.range(500, 20_000).select(
        F.concat(F.lit("https://h/seen-"), F.col("id")).alias("u")
    )
    assert kept.where(probe(F.col("u"))).count() == 15_000 + 4_500
    gone = spark.createDataFrame([(u,) for u in doomed], "u string")
    # deleted keys may rarely still 'hit' via another key's identical
    # (bucket, fingerprint) — the documented cuckoo semantics; with
    # 16-bit fingerprints that residue is ~0
    assert gone.where(probe(F.col("u"))).count() <= 2
    # driver-side helper agrees
    assert not filt.contains("https://h/seen-3")
    assert filt.contains("https://h/seen-19999")


def test_prefilter_composes_with_exact_anti_join(spark):
    members = spark.range(2_000).select(
        F.concat(F.lit("https://h/p-"), F.col("id")).alias("url_hash")
    )
    f = CuckooFilter.build(members, "url_hash", expected=2_000, n_shards=4)
    cands = spark.range(1_000, 3_000).select(
        F.concat(F.lit("https://h/p-"), F.col("id")).alias("url_hash")
    )
    # prefilter keeps possible members; exact anti-join stays exact
    maybe_seen = f.prefilter(cands, "url_hash")
    new = cands.join(maybe_seen.join(members, "url_hash"), "url_hash", "left_anti")
    got = sorted(r.url_hash for r in new.collect())
    assert got == sorted(f"https://h/p-{i}" for i in range(2_000, 3_000))


def test_shared_fingerprint_delete_keeps_other_key(spark):
    """Code-review r5: two DISTINCT keys colliding on (shard, fp, bucket
    pair) must occupy two slots — deleting one may not false-negative
    the other (insert-time fp dedup broke this)."""
    n_shards = 4
    n_buckets = CuckooFilter.sizing(max(1, 20_000 // n_shards))

    def sig(v):
        h = CuckooFilter._key_hash(v)
        f = CuckooFilter._fingerprint(h >> 16)
        i1 = (h >> 32) & (n_buckets - 1)
        i2 = (i1 ^ CuckooFilter._fp_hash(f)) & (n_buckets - 1)
        return (h % n_shards, f, frozenset((i1, i2)))

    seen, pair = {}, None
    for i in range(200_000):
        v = f"https://h/c-{i}"
        s = sig(v)
        if s in seen:
            pair = (seen[s], v)
            break
        seen[s] = v
    assert pair is not None, "no colliding pair in 200k keys?"
    a, b = pair
    members = spark.createDataFrame(
        [(f"https://h/c-{i}",) for i in range(1000)] + [(a,), (b,)],
        "u string",
    )
    f = CuckooFilter.build(members, "u", expected=20_000, n_shards=n_shards)
    assert f.contains(a) and f.contains(b)
    assert f.delete([a]) == 1
    assert f.contains(b)  # the surviving sharer keeps its copy


def test_sql_shard_matches_python_key_hash(spark):
    """The repartition key (SQL conv of md5 prefix) must equal the
    Python-side _key_hash shard for every value — a drift here silently
    degrades build parallelism into the slow shard-merge path."""
    import pyspark.sql.functions as F2

    n_shards = 8
    vals = spark.range(2_000).select(
        F2.concat(F2.lit("https://x/"), F2.col("id")).alias("v")
    )
    sql_shard = F2.pmod(
        F2.conv(F2.substring(F2.md5("v"), 1, 16), 16, 10).cast(
            "decimal(38,0)"
        ),
        F2.lit(n_shards),
    ).cast("int")
    rows = vals.select("v", sql_shard.alias("s")).collect()
    for r in rows:
        assert r.s == CuckooFilter._key_hash(r.v) % n_shards, r.v
