"""Dataset composition (operators/compose.py): float-free mixture sampling
(determinism, nesting, rate accuracy) and concat-and-chunk packing math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import compose


def test_exact_threshold_guards():
    assert compose.exact_threshold(0.5) == 1 << 59
    assert compose.exact_threshold(1.0) == 1 << 60
    assert compose.exact_threshold(0.0) == 0
    # any rate is fine — the integer is fixed at plan-build time
    assert 0 < compose.exact_threshold(0.3) < 1 << 60
    with pytest.raises(ValueError):
        compose.exact_threshold(1.5)
    with pytest.raises(ValueError):
        compose.exact_threshold(-0.1)


@pytest.fixture(scope="module")
def strata(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_sample_rates_and_nesting(strata):
    half = compose.mixture_sample(strata, {"a": 0.5, "b": 0.5})
    quarter = compose.mixture_sample(strata, {"a": 0.25, "b": 0.25})
    n_half, n_quarter = half.count(), quarter.count()
    assert abs(n_half / 2000 - 0.5) < 0.05
    assert abs(n_quarter / 2000 - 0.25) < 0.05
    # threshold sampling nests: the 25% sample is a subset of the 50% one
    q_ids = {r["doc_id"] for r in quarter.collect()}
    h_ids = {r["doc_id"] for r in half.collect()}
    assert q_ids <= h_ids
    # deterministic across runs
    assert {r["doc_id"] for r in
            compose.mixture_sample(strata, {"a": 0.5, "b": 0.5}).collect()} == h_ids


def test_mixture_default_rate_drops_unlisted(strata):
    only_a = compose.mixture_sample(strata, {"a": 1.0})
    assert only_a.filter(F.col("lang") == "b").count() == 0
    assert only_a.count() == 1000


def test_pack_sequences_math(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(40)],
        "doc_id long, text string",
    )
    out = compose.pack_sequences(docs, budget=25, n_shards=2).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 40
    assert len(by_shard) >= 2  # the hash actually distributes across shards
    for rows in by_shard.values():
        cum = 0
        for r in rows:
            assert r["n_tokens"] == 10
            assert r["tok_start"] == cum
            assert r["seq_first"] == cum // 25
            assert r["seq_last"] == (cum + 10 - 1) // 25
            cum += 10
        # 10-token docs in 25-token sequences MUST straddle somewhere
        if len(rows) >= 3:
            assert any(r["seq_first"] != r["seq_last"] for r in rows)


def test_plans_are_jvm_only(strata):
    for df in (
        compose.mixture_sample(strata, {"a": 0.5}),
        compose.pack_sequences(
            strata.withColumn("text", F.lit("x y z")), budget=2, n_shards=2
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cap_per_group(spark):
    rows = [(i, f"h{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = compose.cap_per_group(df, group_col="source", n=4).collect()
    assert len(out) == 12
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r["doc_id"])
    # deterministic: the FIRST 4 ids of each host survive
    for h, ids in by.items():
        assert sorted(ids) == sorted(
            i for i in range(30) if f"h{i % 3}" == h
        )[:4]
    # cap larger than any group is the identity
    assert compose.cap_per_group(df, group_col="source", n=99).count() == 30


def test_hash_split_partition_properties(strata):
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    out = compose.hash_split(strata, fr).collect()
    assert len(out) == 2000  # exhaustive: every row assigned
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}  # all splits populated
    # disjoint by construction (one column), fractions roughly honored
    assert abs(len(by["train"]) / 2000 - 0.75) < 0.05
    # stability under corpus growth: membership is a pure function of id
    half = strata.filter(F.col("doc_id") < 1000)
    half_out = {r["doc_id"]: r["split"]
                for r in compose.hash_split(half, fr).collect()}
    full_out = {r["doc_id"]: r["split"] for r in out}
    assert all(full_out[i] == s for i, s in half_out.items())
    with pytest.raises(ValueError):
        compose.hash_split(strata, {"a": 0.5, "b": 0.4})


def test_temperature_mixture_rates_and_noop(spark):
    from autoextraction_spark.operators.compose import temperature_mixture

    rows = [(i, "a" if i < 80 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # tau=0.5 over p = (0.8, 0.2): ratio ∝ p^-0.5 → r_a = sqrt(0.2/0.8) = 0.5,
    # r_b = 1 (the rarest stratum keeps every row)
    out = temperature_mixture(df, tau=0.5).collect()
    rates = {r.lang: r.rate for r in out}
    assert rates == {"a": 0.5, "b": 1.0}
    kept = {s: sum(1 for r in out if r.lang == s) for s in ("a", "b")}
    assert kept["b"] == 20  # rate 1 keeps all
    assert 25 <= kept["a"] <= 55  # hash-deterministic ≈ rate·n
    # tau=1 is the identity mixture: every stratum at rate 1, nothing dropped
    noop = temperature_mixture(df, tau=1.0).collect()
    assert len(noop) == 100
    assert {r.rate for r in noop} == {1.0}


def test_chunk_tokens_coverage_and_overlap(spark):
    from autoextraction_spark.operators.compose import chunk_tokens

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    rows = sorted(
        chunk_tokens(df, window=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    got = [(r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk) for r in rows]
    # doc 1: starts 0,3,6,9 -> last chunk is the single trailing token
    assert got == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),
        (2, 0, 1, "solo"),
    ]
    # every token appears in some chunk; consecutive chunks overlap by 1
    covered = set(" ".join(c for _, _, _, c in got[:4]).split())
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_tokens_rejects_bad_stride(spark):
    from autoextraction_spark.operators.compose import chunk_tokens

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_tokens(df, window=4, stride=5)


def test_mixture_plan_rates_and_epochs(spark):
    from autoextraction_spark.operators.compose import mixture_plan

    rows = [(i, "big" if i < 90 else ("mid" if i < 99 else "tiny"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r.lang: (r.n, r.p, r.q, r.keep_rate, r.epochs, r.clipped)
        for r in mixture_plan(df, tau=0.5, max_epochs=4.0).collect()
    }
    import math

    ps = {"big": 0.9, "mid": 0.09, "tiny": 0.01}
    z = sum(math.sqrt(v) for v in ps.values())
    for s, p in ps.items():
        q = math.sqrt(p) / z
        ratio = q / p
        n, gp, gq, kr, ep, cl = got[s]
        assert n == int(p * 100)
        assert gp == round(p, 6) and gq == round(q, 6)
        assert kr == round(min(ratio, 1.0), 6)
        assert ep == round(min(ratio, 4.0), 6)
        assert cl == (ratio > 4.0)
    # the dominant stratum is subsampled, the tiny one clips at 4 epochs
    assert got["big"][3] < 1.0 and got["tiny"][5] is True
