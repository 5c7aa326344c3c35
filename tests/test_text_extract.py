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


def test_host_link_graph_extracts_and_aggregates(spark):
    from autoextraction_spark.operators.text_extract import host_link_graph

    pages = spark.createDataFrame(
        [
            ("https://a.com/p1",
             b'<p><a href="https://b.com/x">t</a><a href="https://b.com/y">u'
             b'</a><a href="/rel">r</a></p>'),
            ("https://a.com/p2", b'<a href="https://b.com/z">v</a>'),
            ("http://b.com/q", b'<a href="https://a.com/">w</a>no links here'),
            ("https://c.com/r", b"<p>no anchors at all</p>"),
        ],
        "url string, html binary",
    )
    got = {
        (r.src_host, r.dst_host): (r.is_intra, r.n_links, r.n_pages)
        for r in host_link_graph(pages).collect()
    }
    assert got == {
        # 3 links from 2 distinct a.com pages to b.com
        ("a.com", "b.com"): (False, 3, 2),
        # the relative link resolves to the page's own host
        ("a.com", "a.com"): (True, 1, 1),
        ("b.com", "a.com"): (False, 1, 1),
        # c.com page has no hrefs -> no edge rows at all
    }


def test_page_links_resolves_targets(spark):
    from autoextraction_spark.operators.text_extract import page_links

    pages = spark.createDataFrame(
        [("https://a.com/p1",
          b'<a href="https://b.com/x">t</a><a href="/rel">r</a>')],
        "url string, html binary",
    )
    got = {
        r.href: (r.src_host, r.dst_host, r.target_url)
        for r in page_links(pages).collect()
    }
    assert got == {
        "https://b.com/x": ("a.com", "b.com", "https://b.com/x"),
        # relative links resolve against the page host, scheme https
        "/rel": ("a.com", "a.com", "https://a.com/rel"),
    }


def test_page_links_extracts_anchor_text(spark):
    from autoextraction_spark.operators.text_extract import page_links

    pages = spark.createDataFrame(
        [("https://a.com/p1",
          b'<a href="https://b.com/x">Acme Corp</a><a href="/rel">about us</a>')],
        "url string, html binary",
    )
    got = {r.href: r.anchor for r in page_links(pages).collect()}
    assert got == {"https://b.com/x": "Acme Corp", "/rel": "about us"}
