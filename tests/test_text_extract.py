"""Stage A: byte-identical text extraction (BASELINE.json per-row invariant).

Golden fixtures in tests/fixtures/golden_text.json are committed reference
outputs — any change to extract_text() that alters a single byte fails here.
"""

import json
import os

from pyspark.sql import functions as F

from autoextraction_spark import corpus
from autoextraction_spark.operators.text_extract import extract_text, with_extracted_text

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_extract_text_pure_function():
    html = (
        "<html><head><title>T</title></head><body><h1>Head</h1>"
        "<p>one  two</p><p>a &amp; b</p><br/>tail"
        "<script>var x = '<p>not text</p>';</script></body></html>"
    )
    assert extract_text(html) == "T\nHead\none two\na & b\ntail"


def test_extract_text_handles_bytes_and_unicode():
    assert extract_text("<p>王伟任职于华信集团。</p>".encode()) == "王伟任职于华信集团。"


def test_golden_text_byte_identical(spark, sf_dir):
    with open(os.path.join(FIXTURES, "golden_text.json")) as f:
        golden = {r["url"]: r["text"] for r in json.load(f)}
    pages = corpus.web_pages(spark, sf_dir).filter(F.col("doc_id") < 40)
    got = {
        r["url"]: r["text"]
        for r in with_extracted_text(pages).select("url", "text").collect()
    }
    assert got == golden  # byte-identical per url


def test_html_column_dropped_after_extraction(spark, sf_dir):
    # column-pruning discipline: downstream stages must not carry the binary
    out = with_extracted_text(corpus.web_pages(spark, sf_dir))
    assert "html" not in out.columns
