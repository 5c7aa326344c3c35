"""Multi-slot (3-role) event extraction — DuEE-style ordered filling."""

import json
import os

from autoextraction_spark import corpus
from autoextraction_spark import scorers
from autoextraction_spark.operators import detect, output, slot_fill
from autoextraction_spark.operators.text_extract import with_extracted_text

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_event_candidates_constrained():
    text = "Acme Corp hired Alice Stone in Denver."
    got = scorers.event_candidates(text, "hired", {}, "employer")
    assert got[0][0] == "Acme Corp"
    got = scorers.event_candidates(text, "hired", {"employer": "Acme Corp"}, "employee")
    assert got[0][0] == "Alice Stone"
    got = scorers.event_candidates(
        text, "hired", {"employer": "Acme Corp", "employee": "Alice Stone"}, "city"
    )
    assert got[0][0] == "Denver"
    # wrong constraint -> no match
    assert scorers.event_candidates(text, "hired", {"employer": "Beta Labs"}, "employee") == []


def test_event_pipeline_matches_fixture(spark, sf_dir):
    with open(os.path.join(FIXTURES, "golden_events.json")) as f:
        golden = {(g["url"], g["etype"], g["role"], g["value"]) for g in json.load(f)}
    urls = {u for (u, _, _, _) in golden}
    pages = with_extracted_text(corpus.web_pages(spark, sf_dir))
    det = detect.detect_relations(pages)
    completed = slot_fill.ordered_slot_fill(det)
    rows = output.to_event_rows(output.completed_filter(completed))
    got = {
        (r.url, r.etype, r.role, r.value)
        for r in rows.collect()
        if r.url in urls
    }
    assert got == golden


def test_event_full_corpus_exact(spark, sf_dir):
    pages = with_extracted_text(corpus.web_pages(spark, sf_dir))
    det = detect.detect_relations(pages)
    completed = slot_fill.ordered_slot_fill(det)
    pred = output.to_event_rows(output.completed_filter(completed))
    gold = corpus.gold_events(spark, sf_dir)
    assert pred.exceptAll(gold).isEmpty()
    assert gold.exceptAll(pred).isEmpty()


def test_triples_unaffected_by_events(spark, sf_dir):
    # mixed-arity corpus: the 2-slot relational output must not change
    pages = with_extracted_text(corpus.web_pages(spark, sf_dir))
    det = detect.detect_relations(pages)
    completed = slot_fill.ordered_slot_fill(det)
    trip = output.to_triples(output.completed_filter(completed))
    gold = corpus.gold_triples(spark, sf_dir)
    m = output.metric_f1(trip, gold).collect()[0]
    assert m.precision == 1.0 and m.recall == 1.0
