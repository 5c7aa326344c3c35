"""End-to-end parity: pipeline triples vs reference-derived golden fixtures.

This is the BASELINE.json gate: triple P/R ≥ 0.95 on the eval split,
byte-identical text already covered in test_text_extract.
"""

import json
import os

from autoextraction_spark import corpus
from autoextraction_spark.operators import detect, output, slot_fill
from autoextraction_spark.operators.text_extract import with_extracted_text

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _run_pipeline(spark, sf_dir, policy="rl"):
    pages = corpus.web_pages(spark, sf_dir)
    txt = with_extracted_text(pages)
    det = detect.detect_relations(txt)
    completed = slot_fill.ordered_slot_fill(det, policy=policy)
    return output.to_triples(output.completed_filter(completed))


def test_triples_match_golden_fixture(spark, sf_dir):
    with open(os.path.join(FIXTURES, "golden_triples.json")) as f:
        golden = {(g["url"], g["pred"], g["subj"], g["obj"]) for g in json.load(f)}
    urls = {u for (u, _, _, _) in golden}
    got = {
        (r.url, r.pred, r.subj, r.obj)
        for r in _run_pipeline(spark, sf_dir).collect()
        if r.url in urls
    }
    assert got == golden


def test_full_corpus_pr_at_least_095(spark, sf_dir):
    pred = _run_pipeline(spark, sf_dir)
    gold = corpus.gold_triples(spark, sf_dir)
    row = output.metric_f1(pred, gold).collect()[0]
    assert row.precision >= 0.95, row
    assert row.recall >= 0.95, row


def test_order_sensitivity_split_nonempty(spark, sf_dir):
    # O8 (data_filter.py:174-242): the adaptive and fixed orders must
    # disagree on at least one document — that's the "hard split"
    rl = _run_pipeline(spark, sf_dir)
    seq = _run_pipeline(spark, sf_dir, policy="sequence")
    disagree = rl.exceptAll(seq)
    assert disagree.count() > 0
