"""Deterministic synthetic Common-Crawl-style web corpus.

Builds the pipeline input table ``(url, warc_ts, html, text, lang)`` (per
BASELINE.json input_hint) from the driver's ``documents.parquet`` skeleton:
``doc_id`` supplies scale + language mix, all content is pure integer
arithmetic on ``doc_id`` (schema.py) so a DuckDB SQL oracle can recompute the
expected triples without running the pipeline.

Generation runs distributed via ``mapInPandas`` (Arrow batches) — at 10^12
documents this is an embarrassingly parallel map over the id-space, no
shuffle, no driver-side loop.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema as S

WEB_PAGES_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)

WEB_PAGES_SCHEMA_NO_HTML = (
    "doc_id long, url string, warc_ts timestamp, text string, lang string"
)

_EPOCH = _dt.datetime(2024, 1, 1)


def build_html(doc_id: int, lang: str) -> str:
    """Pure function doc_id -> html. The ONLY producer of page content."""
    parts = [
        f'<html><head><title>Doc {doc_id}</title><meta charset="utf-8"/></head><body>',
        f"<h1>Report {doc_id}</h1>",
    ]
    for i in range(S.n_facts(doc_id)):
        parts.append(f"<p>{S.fact_sentence(doc_id, i, lang)}</p>")
        if (doc_id + i) % 3 == 0:
            parts.append(f"<p>{S.FILLERS[(doc_id * 5 + i) % len(S.FILLERS)]}</p>")
    if S.has_event(doc_id, lang):
        parts.append(f"<p>{S.event_sentence(doc_id, lang)}</p>")
    parts.append('<script>var tracker = "t0";</script></body></html>')
    return "".join(parts)


def warc_ts(doc_id: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(days=doc_id % 365, seconds=(doc_id * 7) % 86400)


def _gen(with_text: bool, emit_html: bool = True):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.text_extract import extract_text

        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            langs = pdf["lang"].map(S.doc_lang)
            html = [
                build_html(d, lg).encode("utf-8")
                for d, lg in zip(doc_ids, langs)
            ]
            out = {
                "doc_id": doc_ids,
                "url": [S.page_url(d) for d in doc_ids],
                "warc_ts": [warc_ts(d) for d in doc_ids],
                "html": html,
                "text": [extract_text(h) for h in html] if with_text else None,
                "lang": langs,
            }
            if not emit_html:
                del out["html"]
            yield pd.DataFrame(out)

    return run


def web_pages(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = 1,
    with_text: bool = False,
    emit_html: bool = True,
    where=None,
) -> DataFrame:
    """Synthesize the input table from the documents skeleton at ``sf_dir``.

    ``text`` is NULL — stage A (text_extract) fills it; the per-row invariant
    is byte-identical extraction per url. ``with_text=True`` runs the SAME
    frozen ``extract_text`` inside the generator pass: a real deployment
    reads pages from storage and extracts in ONE python stage, and fusing
    the (sandbox-only) generator with extraction restores that production
    python-op depth — the html bytes otherwise cross the Arrow boundary
    twice, which measurably caps throughput. ``replicate=k`` scales the
    corpus k× for load/scaling runs: replica r shifts ids by r·(max_id+1),
    producing distinct urls AND distinct facts (all content is doc_id
    arithmetic).

    ``emit_html=False`` omits the ``html`` column from the OUTPUT (the bytes
    are still built internally when extraction needs them). ``mapInPandas``
    output cannot be column-pruned into the python side — a downstream
    ``.drop("html")`` still pays full Arrow serialization of the largest
    column — so every consumer that only wants extracted text should ask for
    the html-free schema here instead of dropping the column after.
    """
    skel = doc_skeleton(spark, sf_dir, replicate, where=where)
    return pages_from_skeleton(skel, with_text=with_text, emit_html=emit_html)


#: ~119 bytes/row measured on the driver's documents.parquet (zstd'd
#: doc_id/lang/text skeleton); only order-of-magnitude accuracy matters —
#: the estimate is clamped to [parallelism, waves_per_core·parallelism].
_SKEL_BYTES_PER_DOC = 120
#: Below this many docs per task the fixed python-task protocol latency
#: dominates the task's compute (~2500 docs ≈ 400 ms of episode work).
_MIN_DOCS_PER_TASK = 2500


def _estimate_doc_count(spark: SparkSession, sf_dir: str) -> int | None:
    """Estimate the skeleton row count from the parquet byte size via the
    Hadoop FS API (works for single files and directories, any scheme) —
    a metadata call, no Spark job. Returns None when the path cannot be
    sized (caller falls back to the fixed wave cap)."""
    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/documents.parquet")
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        size = fs.getContentSummary(path).getLength()
        return max(1, int(size) // _SKEL_BYTES_PER_DOC)
    except Exception:
        return None


def doc_skeleton(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = 1,
    where=None,
    waves_per_core: int = 4,
) -> DataFrame:
    """The (doc_id, lang) id-space the corpus is generated from.

    Split out of ``web_pages`` so load/scaling harnesses can materialize it
    ONCE (localCheckpoint) and time only the pipeline over it — the skeleton
    bootstrap (tiny parquet read, repartition shuffle, max-id agg, replica
    explode) is sandbox scaffolding standing in for "the crawl is already in
    storage", not pipeline work.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    if where is not None:
        # applied BELOW the generator mapInPandas: Catalyst pushes a doc_id
        # predicate into the parquet scan (incremental-crawl partition prune)
        docs = docs.filter(where)
    # Repartition the tiny skeleton BEFORE generation: the skeleton is 1-2
    # parquet tasks, and everything generated from it would otherwise run at
    # that parallelism — a serial bottleneck that caps scaling. A real
    # Common-Crawl read has thousands of input splits and needs no such step.
    # waves_per_core (default 4, the CAP): the generated-corpus stage's tail
    # is 1/(waves·cores) of the work, so one straggling partition (or one of
    # this VM's documented 10-20s stalls) costs a sliver, not a wave — the
    # serial floor that capped scaling efficiency at 2 waves/core. The
    # scaling harness uses 8: finer tasks let the scheduler route a stalled
    # core's remaining work elsewhere, and the stall tax drops from a whole
    # wave to stall/cores — measured worth ~7% of wall at local[16].
    #
    # SCALE-ADAPTIVE (r6, guide §2): the wave count is derived from the
    # input size instead of a constant tuned to the big-run scale. Every
    # python task costs a fixed JVM↔worker protocol latency (~250-500 ms in
    # this sandbox, measured via event-log task metrics: 480 ms median task
    # wall vs 8 ms CPU on a 78-doc partition), so a 5k-doc corpus at 4
    # waves/core pays 4 waves of pure protocol for ~50 ms of compute. Docs
    # are estimated from the parquet footprint (a filesystem metadata call,
    # zero Spark jobs); partitions = clamp(docs/_MIN_DOCS_PER_TASK,
    # parallelism, waves_per_core·parallelism) keeps one straggler-absorbing
    # wave structure at scale (the cap reproduces the r5 big-run layout
    # exactly) while a small corpus runs one wave of full-size tasks.
    par = spark.sparkContext.defaultParallelism
    est_docs = _estimate_doc_count(spark, sf_dir) * max(int(replicate), 1)
    cap = max(par * int(waves_per_core), 16)
    if est_docs is None:
        n_parts = cap
    else:
        n_parts = min(cap, max(par, 16, -(-est_docs // _MIN_DOCS_PER_TASK)))
    if replicate > 1:
        # shift derives from the DATA (max id + 1), so replicas can never
        # collide with base ids however large the skeleton grows (ADVICE.md);
        # one tiny agg job, only on replicated (scaling-bench) runs
        shift = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1
        docs = docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("r"),
            "doc_id",
            "lang",
        ).select((F.col("doc_id") + F.col("r") * shift).alias("doc_id"), "lang")
    # Repartition AFTER the replica explode: partitioning the 5k-row seed
    # first gives every partition ~78 whole documents ×k identical replicas,
    # so partition cost inherits the doc-length distribution's skew (spread
    # measured 12.5→17.4 s at local[16]); round-robin over the exploded rows
    # mixes replicas of ALL documents into every partition — near-identical
    # per-task cost at the same shuffle price (the rows are two skinny
    # columns either way, and this is untimed bootstrap scaffolding).
    return docs.repartition(n_parts)


def pages_from_skeleton(
    skel: DataFrame, with_text: bool = False, emit_html: bool = True
) -> DataFrame:
    """Generate pages from an existing (doc_id, lang) skeleton DataFrame."""
    return skel.mapInPandas(
        _gen(with_text, emit_html),
        schema=WEB_PAGES_SCHEMA if emit_html else WEB_PAGES_SCHEMA_NO_HTML,
    )


def gold_triples(spark: SparkSession, sf_dir: str, canonical: bool = False) -> DataFrame:
    """Expected (url, pred, subj, obj) — derived from the same fact math.

    Used as the gold side of MetricF1 and as pytest fixtures. ``canonical``
    selects post-entity-linking surfaces.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, src_lang in zip(pdf["doc_id"].astype("int64"), pdf["lang"]):
                lang = S.doc_lang(src_lang)
                url = S.page_url(int(d))
                for rel, subj, obj, obj_canon in S.gold_facts(int(d), lang):
                    rows.append((url, rel, subj, obj_canon if canonical else obj))
            yield pd.DataFrame(rows, columns=["url", "pred", "subj", "obj"])

    return docs.mapInPandas(gen, schema="url string, pred string, subj string, obj string").distinct()


def gold_fact_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold (url, i, rel, subj, obj, sentence, subj_start, obj_start) rows —
    one per planted fact, with the CHAR offsets of both entities in the
    rendered sentence.

    This is the training-data-generation input shape: the reference's dataset
    files carry gold tuples next to the text (nyt.py relation_list) and, for
    DuEE, explicit ``argument_start_index`` char offsets (duee.py:38-64) —
    exactly what the P10 (token-match) and P11 (char-span) span-labeling
    operators consume.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, src_lang in zip(pdf["doc_id"].astype("int64"), pdf["lang"]):
                d = int(d)
                lang = S.doc_lang(src_lang)
                url = S.page_url(d)
                for i in range(S.n_facts(d)):
                    rel, subj, conn, obj, tail = S.fact_parts(d, i, lang)
                    obj_canon = S.fact_surfaces(d, i, lang)[3]
                    rows.append(
                        (url, i, lang, rel, subj, obj, obj_canon,
                         f"{subj}{conn}{obj}{tail}", 0, len(subj) + len(conn))
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "i", "lang", "rel", "subj", "obj", "obj_canon",
                         "sentence", "subj_start", "obj_start"],
            )

    return docs.mapInPandas(
        gen,
        schema="url string, i long, lang string, rel string, subj string, "
               "obj string, obj_canon string, sentence string, "
               "subj_start long, obj_start long",
    )


def gold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected (url, etype, role, value) rows of the event pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, src_lang in zip(pdf["doc_id"].astype("int64"), pdf["lang"]):
                d = int(d)
                lang = S.doc_lang(src_lang)
                if not S.has_event(d, lang):
                    continue
                etype, vals = S.event_surfaces(d, lang)
                for role, v in zip(S.EVENTS[etype]["roles"], vals):
                    rows.append((S.page_url(d), etype, role, v))
            yield pd.DataFrame(
                rows, columns=["url", "etype", "role", "value"]
            )

    return docs.mapInPandas(
        gen, schema="url string, etype string, role string, value string"
    ).distinct()
