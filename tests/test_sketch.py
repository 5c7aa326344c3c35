"""Sketch operators (HLL, KMV, count-min, Bloom semi-join): the structural
guarantees each sketch is defined by, checked on small closed-form inputs.
Cross-engine value parity is covered by the oracle gate
(hll_distinct / kmv_distinct / cms_heavy_hitters / bloom_prune)."""

import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import sketch


def _keys_df(spark, n, prefix="key"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k"),
        F.lit("g").alias("grp"),
    )


def test_hll_small_set_uses_linear_counting_and_is_close(spark):
    # 30 distinct keys, 64 registers -> many empty registers, the
    # linear-counting branch; estimate must land near the truth
    df = _keys_df(spark, 30)
    regs = sketch.hll_registers(df, "k", ["grp"])
    est = sketch.hll_estimate(regs, ["grp"]).collect()[0].hll_estimate
    assert abs(est - 30) / 30 < 0.35
    # registers never exceed the group's bucket budget and stay in range
    rows = regs.collect()
    assert len(rows) <= sketch.HLL_M
    assert all(1 <= r.reg <= sketch.HLL_MAX_RHO for r in rows)


def test_hll_duplicates_do_not_move_the_estimate(spark):
    # HLL counts DISTINCT: replicating every key 50x yields the identical
    # register table (max is idempotent under duplicates)
    base = _keys_df(spark, 200)
    dup = base.withColumn(
        "r", F.explode(F.sequence(F.lit(1), F.lit(50)))
    ).drop("r")
    r1 = sketch.hll_estimate(
        sketch.hll_registers(base, "k", ["grp"]), ["grp"]
    ).collect()[0].hll_estimate
    r2 = sketch.hll_estimate(
        sketch.hll_registers(dup, "k", ["grp"]), ["grp"]
    ).collect()[0].hll_estimate
    assert r1 == r2


def test_kmv_exact_below_k(spark):
    # fewer distinct keys than k: the sketch IS the key set, estimate exact
    df = _keys_df(spark, 40)
    row = sketch.kmv_distinct(df, "k", ["grp"], k=64).collect()[0]
    assert row.n_kept == 40
    assert row.kmv_estimate == 40.0


def test_kmv_estimator_above_k(spark):
    # 2000 distinct keys, k=64: the (k-1)/h_(k) estimator should land
    # within ~3/sqrt(k) (~37%) of the truth for the fixed md5 hash
    df = _keys_df(spark, 2000)
    row = sketch.kmv_distinct(df, "k", ["grp"], k=64).collect()[0]
    assert row.n_kept == 64
    assert abs(row.kmv_estimate - 2000) / 2000 < 0.375


def test_cms_never_underestimates(spark):
    # the count-min guarantee: estimate >= exact for EVERY key, even with
    # a deliberately tiny 4x8 sketch over 40 distinct keys
    df = spark.range(400).select(
        F.concat(F.lit("k"), (F.col("id") % 40).cast("string")).alias("k")
    )
    counters = sketch.cms_counters(df, "k")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = sketch.cms_point_estimates(exact.select("k"), counters, "k")
    bad = (
        exact.join(est, "k")
        .filter(F.col("cms_estimate") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0
    # total mass per sketch row equals the input size (counters partition it)
    per_row = counters.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r.s == 400 for r in per_row)


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    build = _keys_df(spark, 80)
    bits = sketch.bloom_bits(build, "k")
    assert bits.count() <= min(sketch.BLOOM_M, 80 * sketch.BLOOM_K)
    # every build key must pass its own filter
    flags = sketch.bloom_probe_keys(build.select("k"), bits, "k")
    assert flags.filter(~F.col("bloom_pass")).count() == 0


def test_bloom_rejects_most_non_members(spark):
    build = _keys_df(spark, 80, prefix="in")
    probe = _keys_df(spark, 500, prefix="out")
    bits = sketch.bloom_bits(build, "k")
    flags = sketch.bloom_probe_keys(probe.select("k"), bits, "k")
    fp = flags.filter(F.col("bloom_pass")).count()
    # n=80, m=1024, k=3 -> theoretical fpr ~1.1%; allow generous slack
    assert fp / 500 < 0.10


def test_hll_merge_equals_direct_build(spark):
    # mergeability: shard-local register tables merged by per-bucket max
    # equal the globally built sketch EXACTLY (max is associative)
    df = spark.range(3000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.lit("g").alias("grp"),
        (F.col("id") % 7).cast("int").alias("shard"),
    )
    direct = sketch.hll_registers(df, "k", ["grp"])
    sharded = sketch.hll_registers(df, "k", ["grp", "shard"])
    merged = sketch.hll_merge(sharded, ["grp"])
    diff = (
        direct.withColumnRenamed("reg", "r1")
        .join(merged.withColumnRenamed("reg", "r2"), ["grp", "bucket"], "full")
        .filter(
            F.col("r1").isNull()
            | F.col("r2").isNull()
            | (F.col("r1") != F.col("r2"))
        )
        .count()
    )
    assert diff == 0


def test_kmv_jaccard_recovers_known_overlap(spark):
    # two groups sharing exactly half their keys: A = 0..1999,
    # B = 1000..2999 -> jaccard = 1000/3000, |A ∩ B| = 1000
    a = spark.range(2000).select(
        F.lit("A").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(1000, 3000).select(
        F.lit("B").alias("g"), F.col("id").cast("string").alias("k")
    )
    kept = sketch.kmv_kept(a.union(b), "k", ["g"], k=128)
    row = sketch.kmv_jaccard(kept, "g", k=128).collect()[0]
    assert row.ga == "A" and row.gb == "B"
    # ~1/sqrt(k) relative noise on the jaccard; generous 3-sigma-ish slack
    assert abs(row.kmv_jaccard - 1 / 3) < 0.12
    assert abs(row.kmv_inter - 1000) / 1000 < 0.45


def test_kmv_jaccard_disjoint_sets_estimate_zero(spark):
    a = spark.range(500).select(
        F.lit("A").alias("g"), F.concat(F.lit("a"), F.col("id")).alias("k")
    )
    b = spark.range(500).select(
        F.lit("B").alias("g"), F.concat(F.lit("b"), F.col("id")).alias("k")
    )
    kept = sketch.kmv_kept(a.union(b), "k", ["g"], k=64)
    row = sketch.kmv_jaccard(kept, "g", k=64).collect()[0]
    assert row.kmv_jaccard == 0.0
    assert row.kmv_inter == 0.0
