"""Stage A — html -> text extraction (pandas UDF, byte-identical per url).

The reference consumes pre-extracted sentences; the north_rule input is raw
Common-Crawl-style html, so this stage owns the per-row invariant
"byte-identical extracted text per url" (BASELINE.json input_hint).

Implementation: one Arrow-vectorized scalar pandas UDF (no per-row Python
round-trips through the JVM). The extraction function is a frozen pure
function — any change to it invalidates the committed golden fixtures, which
is exactly the regression the fixtures exist to catch.

Also home to the crawl-side html consumers (engine-new): hyperlink
extraction (``page_links``), the host-level web graph
(``host_link_graph``), and their downstream crawl-frontier composition in
``__spark_entry__`` — the tables crawl scheduling, host-authority ranking
and spam/link-farm detection start from.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1>", re.S | re.I)
# block-close tags and <br> both become newlines — one alternation pass
# (the two literals cannot overlap, and "\n" cannot create a new match, so
# this is byte-identical to two sequential passes)
_NEWLINE_TAG_RE = re.compile(r"</(p|h1|h2|h3|h4|li|div|title|tr)>|<br\s*/?>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str) -> str:
    """FROZEN pure function: html bytes -> canonical text.

    Rules: drop <script>/<style> blocks; block-close tags and <br> become
    newlines; all other tags dropped; entities unescaped; intra-line
    whitespace collapsed; blank lines removed; lines joined with '\\n'.

    (The output contract is frozen by the golden fixtures; the
    implementation below is the measured-fast form — fewer regex passes,
    whitespace collapsed once over the whole string instead of per line.
    _WS_RE never matches '\\n', so the hoisted sub touches exactly the same
    spans the per-line subs did.)
    """
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_RE.sub("", s)
    s = _NEWLINE_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s)
    return "\n".join(ln for ln in map(str.strip, s.split("\n")) if ln)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Fill the ``text`` column from ``html``.

    Column pruning matters at scale: downstream stages must never re-read
    ``html`` — select it away here so the (huge) binary column is not
    carried through shuffles.
    """
    return pages.withColumn("text", extract_text_udf(F.col("html"))).drop("html")


def page_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Per-link hyperlink extraction from raw page html (engine-new).

    Parses ``href="..."`` attributes with ``regexp_extract_all`` (pure
    codegen — no Python in the path; the pattern is in the RE2∩Java
    dialect subset, the pii_scrub rule) and resolves each link: absolute
    links keep their own host, relative links resolve against the page's
    host (``target_url`` = scheme-https + page host + the relative path —
    path-level base-href resolution is out of scope and documented so).

    Output: one row per extracted link —
    (url, src_host, href, anchor, dst_host, target_url). ``anchor`` is the
    link's inner text (``<a href>TEXT</a>``) — the classic external naming
    evidence for the target page (anchor-text aggregation is how web KGs
    learn entity aliases the page itself never states). The two extracts
    are zipped positionally; both patterns match exactly the well-formed
    ``<a href="...">...</a>`` tags, so the lists align by construction
    (malformed tags match neither — documented).

    Scale shape (100 TB): the html column is consumed in the SAME
    projection that discards it — only (url, href, anchor) survive the
    explode, so the page payload never enters any shuffle.
    """
    href_re = r'href="([^"]+)"'
    anchor_re = r'<a href="[^"]*">([^<]*)</a>'
    host_re = r"^https?://([^/]+)"
    h = F.col(html_col).cast("string")
    links = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(h, F.lit(href_re), F.lit(1)).alias("href"),
                F.regexp_extract_all(h, F.lit(anchor_re), F.lit(1)).alias("anchor"),
            )
        ).alias("z"),
    ).select("url", F.col("z.href").alias("href"), F.col("z.anchor").alias("anchor"))
    src_host = F.regexp_extract(F.col("url"), host_re, 1)
    is_abs = F.col("href").rlike("^https?://")
    dst_host = F.when(
        is_abs, F.regexp_extract(F.col("href"), host_re, 1)
    ).otherwise(src_host)
    target_url = F.when(is_abs, F.col("href")).otherwise(
        F.concat(F.lit("https://"), src_host, F.col("href"))
    )
    return links.select(
        "url",
        src_host.alias("src_host"),
        "href",
        "anchor",
        dst_host.alias("dst_host"),
        target_url.alias("target_url"),
    )


def host_link_graph(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Host-level web-graph aggregation over :func:`page_links` (the
    crawl-side complement to the KG entity graph).

    Output: (src_host, dst_host, is_intra, n_links, n_pages) — total links
    and distinct linking pages per directed host pair.

    Scale shape: map-side-combinable groupBy keyed by host pair. Host-level
    skew (a hub host linked from everywhere) is the classic AQE-splittable
    aggregate, same as ``pipeline.salted_host_counts``.
    """
    edges = page_links(pages, html_col, url_col).select(
        "src_host", "dst_host", "url"
    )
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.count_distinct(F.col("url")).alias("n_pages"),
        )
        .select(
            "src_host",
            "dst_host",
            (F.col("src_host") == F.col("dst_host")).alias("is_intra"),
            "n_links",
            "n_pages",
        )
    )
