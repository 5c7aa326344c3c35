"""Bigram-LM perplexity (operators/lm.py): counts, smoothing, and scores
must match a hand-computed model; memorized text must score lower-ppl than
out-of-vocabulary text; no python stages in the plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import lm


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    big, uni, voc = lm.train_bigram_lm(ref)
    return ref, big, uni, voc


def test_counts(model):
    _, big, uni, voc = model
    bc = {(r["w1"], r["w2"]): r["c12"] for r in big.collect()}
    # doc0 pairs: (a,b),(b,a),(a,b); doc1: (a,b),(b,c)
    assert bc == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    uc = {r["w1"]: r["c1"] for r in uni.collect()}
    assert uc == {"a": 3, "b": 2}  # histories only: sum(c12) per w1
    assert voc.collect()[0]["v"] == 3.0


def test_perplexity_matches_closed_form(spark, model):
    _, big, uni, voc = model
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           lm.perplexity_score(docs, big, uni, voc, k=0.5).collect()}
    # p(b|a) = (3+0.5)/(3+0.5*3) = 3.5/4.5
    exp_logp = math.log2(3.5 / 4.5)
    assert out[10]["n_bigrams"] == 1
    assert abs(out[10]["avg_logp"] - round(exp_logp, 6)) < 2e-6
    assert abs(out[10]["ppl"] - round(2.0 ** -exp_logp, 6)) < 2e-6
    # unseen history: p = 0.5/(0+1.5) = 1/3 = 1/V
    assert abs(out[11]["ppl"] - 3.0) < 2e-6


def test_reference_text_scores_lower(spark, model):
    ref, big, uni, voc = model
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "q r s t")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["ppl"] for r in
           lm.perplexity_score(docs, big, uni, voc).collect()}
    assert out[0] < out[1]


def test_plan_is_jvm_only(spark, model):
    _, big, uni, voc = model
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        lm.perplexity_score(docs, big, uni, voc)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
