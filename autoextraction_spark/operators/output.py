"""Stage D — output semantics: completed-state filter, cond-string compat,
triple materialization, set-dedup, MetricF1 (reference operators O1-O5).

All pure DataFrame ops — at scale this is one narrow filter/project plus one
``distinct`` (the only shuffle, on the small (url, pred, subj, obj) output,
never on the text column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .. import schema as S


def completed_filter(states: DataFrame, keep_none: bool = False) -> DataFrame:
    """O1 (predict.py:102-108): keep fully-filled states; drop '[None]' tuples.

    ``keep_none=True`` mirrors the DuEE path that keeps them (DQN.py:305).
    """
    done = states.filter(F.size("remaining") == 0)
    if keep_none:
        return done
    return done.filter(
        ~F.array_contains(F.map_values("assigned"), S.NONE_SENTINEL)
    )


def _slot(lang_col: Column, idx: int) -> Column:
    return F.when(
        lang_col == "zh", F.col("assigned").getItem(S.ZH_SLOTS[idx])
    ).otherwise(F.col("assigned").getItem(S.EN_SLOTS[idx]))


def to_triples(completed: DataFrame, assume_unique: bool = False) -> DataFrame:
    """Typed states → distinct (url, pred, subj, obj) (O3+O4).

    The reference parses slot values back out of serialized cond strings
    (predict.py:109-126 ``seq2dict``); our state is a typed map, so this is
    a projection — the string grammar survives only in render_cond/parse_cond
    for fixture byte-compat.

    ``assume_unique=True`` skips the ``distinct()`` shuffle. Valid iff the
    upstream ran with ``dedup_assignments=True`` (fused slot fill): the
    distinct key (url, pred, subj, obj) is a function of (url, rel,
    assigned), duplicates of which can only arise inside one episode tree —
    already dropped in-pass. At corpus scale this removes the only
    full-output shuffle of the extraction pipeline (tested equal to the
    shuffling plan).
    """
    proj = completed.select(
        "url",
        F.col("rel").alias("pred"),
        _slot(F.col("lang"), 0).alias("subj"),
        _slot(F.col("lang"), 1).alias("obj"),
    ).filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    return proj if assume_unique else proj.distinct()


def resolve_by_recency(triples: DataFrame, preds: list[str] | None = None) -> DataFrame:
    """KG fusion / truth discovery for FUNCTIONAL predicates: when the
    corpus asserts conflicting objects for the same (subj, pred) — a person
    "born in" two cities across pages — keep the assertion from the most
    recent crawl, ties broken on max obj. One row per (subj, pred) out.

    The recency key derives from the page's crawl identity (here the doc id
    encoded in the url, mapped through the same arithmetic that generated
    ``warc_ts``; in production ``warc_ts`` rides the triple row directly and
    the key is its epoch seconds). The argmax is the engine-portable
    two-step (max key per group → join → max obj among ties) — two
    partial-aggregated groupBys and one equi-join keyed by (pred, subj),
    no window sort over the full KG.
    """
    t = triples
    if preds is not None:
        t = t.filter(F.col("pred").isin(preds))
    doc = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    rk = (doc % 365) * 86400 + (doc * 7) % 86400
    # materialize: the keyed table feeds BOTH the max-key agg and the
    # winner join — unmaterialized, the upstream extraction pipeline would
    # execute twice (the audit_scans recompute class)
    t = t.select("pred", "subj", "obj", rk.alias("rk")).localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    latest = t.groupBy("pred", "subj").agg(F.max("rk").alias("rk"))
    return (
        t.join(latest, ["pred", "subj", "rk"])
        .groupBy("pred", "subj")
        .agg(F.max("obj").alias("obj"))
        .select("subj", "pred", "obj")
    )


def fact_history(
    triples: DataFrame, preds: list[str] | None = None
) -> DataFrame:
    """Temporal KG / SCD-2 fact history (engine-new; the maintenance
    complement to :func:`resolve_by_recency`): instead of keeping only the
    most recent assertion per (subj, pred), emit the full versioned
    timeline — one row per value SEGMENT with ``[valid_from,
    valid_to_excl)`` crawl-time bounds, a version number, and an
    ``is_current`` flag (``valid_to_excl = -1`` marks the open current
    segment). This is the slowly-changing-dimension type-2 shape every
    production KG store keeps for point-in-time queries.

    Same recency key derivation as resolve_by_recency (in production
    ``warc_ts`` rides the triple row). Conflicting objects at the SAME
    crawl instant collapse by max(obj) — the sibling operator's tie rule.
    One hash partitioning on (pred, subj) carries all three window passes
    (lag-mark, running-sum runs, lead-bounds) — no second exchange, no
    UDF, and segments per group are bounded by distinct crawl instants.
    """
    from pyspark.sql import Window

    t = triples
    if preds is not None:
        t = t.filter(F.col("pred").isin(preds))
    doc = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    rk = (doc % 365) * 86400 + (doc * 7) % 86400
    a = (
        t.select("pred", "subj", "obj", rk.alias("rk"))
        .groupBy("pred", "subj", "rk")
        .agg(F.max("obj").alias("obj"))
    )
    w = Window.partitionBy("pred", "subj").orderBy("rk")
    prev = F.lag("obj").over(w)
    marked = a.select(
        "pred",
        "subj",
        "obj",
        "rk",
        F.when(prev.isNull() | (prev != F.col("obj")), 1)
        .otherwise(0)
        .alias("chg"),
    )
    runs = marked.select(
        "pred",
        "subj",
        "obj",
        "rk",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("version"),
    )
    segs = runs.groupBy("pred", "subj", "version").agg(
        F.max("obj").alias("obj"),
        F.min("rk").cast("long").alias("valid_from"),
    )
    w2 = Window.partitionBy("pred", "subj").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return segs.select(
        "subj",
        "pred",
        "obj",
        "version",
        "valid_from",
        F.coalesce(nxt, F.lit(-1)).cast("long").alias("valid_to_excl"),
        nxt.isNull().alias("is_current"),
    )


def fuse_by_provenance(triples: DataFrame, det: DataFrame) -> DataFrame:
    """Provenance-weighted fact fusion (engine-new; no reference
    counterpart): the KG-construction stage between extraction and truth
    discovery. Per distinct fact (subj, pred, obj), aggregate its supporting
    evidence across the crawl — supporting-page count, distinct-host count,
    and a fused confidence under the standard independent-source noisy-OR
    model, ``conf = 1 - Π(1 - rc_i)`` over the per-page detection scores.
    Unlike :func:`resolve_by_recency` (which picks ONE object per functional
    (subj, pred)), fusion keeps every fact and scores it.

    Physical plan: one equi-join on (url, pred) of the unique triple
    sightings against the per-(url, rel) detection scores, then ONE
    partial-aggregated groupBy on the fact key — count / count-distinct /
    sum(ln) all combine map-side, so the shuffle carries per-fact partials,
    never the sighting rows. No window, no UDF, no collect.

    Engine-parity (oracle) discipline: rc rounds to 6 decimals before the
    log (and is clamped below 1.0 so ln stays finite), the log-sum rounds
    to 9 before exp, the fused confidence to 6 — the DuckDB oracle applies
    the identical formula, not an algebraic equivalent.
    """
    sight = triples.join(
        det.select(
            "url",
            F.col("rel").alias("pred"),
            F.least(F.round("rc_score", 6), F.lit(0.999999)).alias("rc"),
        ),
        ["url", "pred"],
    )
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    log_keep = F.round(F.sum(F.log(F.lit(1.0) - F.col("rc"))), 9)
    return sight.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(host).alias("n_hosts"),
        F.round(F.lit(1.0) - F.exp(log_keep), 6).alias("conf"),
    )


def to_event_rows(completed: DataFrame) -> DataFrame:
    """Event states → distinct (url, etype, role, value) rows.

    N-ary tuples are materialized as reified role rows (standard n-ary KG
    encoding); the 2-slot relational states yield nothing here (their slots
    are not event roles)."""
    event_names = list(S.EVENTS)
    return (
        completed.filter(F.col("rel").isin(event_names))
        .select(
            "url",
            F.col("rel").alias("etype"),
            F.explode("assigned").alias("role", "value"),
        )
        .distinct()
    )


def render_cond(states: DataFrame) -> DataFrame:
    """Serialize the typed state to the reference cond grammar
    (Environment.py:106-108,201-204): ``'{rel}; {slot}:{value}…'`` en /
    ``'{rel}； {slot}：{value}…'`` zh — byte-compatible fixture boundary.
    """
    def grammar(slots: list[str], sep: str, colon: str) -> Column:
        parts = [F.col("rel")]
        for s in slots:
            parts.append(
                F.when(
                    F.map_contains_key("assigned", F.lit(s)),
                    F.concat(
                        F.lit(sep), F.lit(s), F.lit(colon), F.col("assigned").getItem(s)
                    ),
                ).otherwise(F.lit(""))
            )
        return F.concat(*parts)

    cond = F.when(
        F.col("lang") == "zh", grammar(S.ZH_SLOTS, "； ", "：")
    ).otherwise(grammar(S.EN_SLOTS, "; ", ":"))
    return states.withColumn("cond", cond)


def parse_cond(df: DataFrame, cond_col: str = "cond") -> DataFrame:
    """O2 inverse (predict.py:109-126): cond string → (rel, assigned map).

    Pure JVM string ops: split on the language separator, then on the first
    colon of each segment.
    """
    def parse_with(sep: str, colon: str):
        segs = F.split(F.col(cond_col), sep)
        pairs = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))
        return (
            F.element_at(segs, 1),
            F.map_from_arrays(
                F.transform(pairs, lambda p: F.element_at(F.split(p, colon, 2), 1)),
                F.transform(pairs, lambda p: F.element_at(F.split(p, colon, 2), 2)),
            ),
        )

    en_rel, en_map = parse_with("; ", ":")
    zh_rel, zh_map = parse_with("； ", "：")
    is_zh = F.col("lang") == "zh"
    return df.withColumn(
        "parsed_rel", F.when(is_zh, zh_rel).otherwise(en_rel)
    ).withColumn("parsed_assigned", F.when(is_zh, zh_map).otherwise(en_map))


def triple_text(triples: DataFrame) -> DataFrame:
    """O3 ``spo2text``: 'pred|subj|obj' (predict.py:129-131)."""
    return triples.withColumn(
        "triple", F.concat_ws("|", F.col("pred"), F.col("subj"), F.col("obj"))
    )


def slot_accounting_f1(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str] | None = None,
    group: str = "pred",
) -> DataFrame:
    """O6 per-dataset accounting F1 (DQN.py:277-427, final P/R/F1 :421-427).

    The reference walks ``env.spo_list``: ``tot`` += gold tuples per episode
    root; for each COMPLETED cond without '[None]', ``tp`` += matched gold
    tuples, else ``tn`` += 1 (the reference's name for an unmatched completed
    extraction — really a false positive). precision = tp/(tp+tn),
    recall = tp/tot. Grouped by ``group`` (per relation/dataset), computed
    as ONE full-outer-join + one aggregation.
    """
    keys = keys or ["url", "pred", "subj", "obj"]
    p = pred.select(*keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(*keys).distinct().withColumn("_g", F.lit(1))
    j = p.join(g, on=keys, how="full_outer")
    has_p, has_g = F.col("_p").isNotNull(), F.col("_g").isNotNull()
    grouped = j.groupBy(group).agg(
        F.count(F.when(has_p & has_g, 1)).alias("tp"),
        F.count(F.when(has_p & ~has_g, 1)).alias("tn"),
        F.count("_g").alias("tot"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("tn"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tot"), F.lit(1))
    return grouped.select(
        group,
        "tp",
        "tn",
        "tot",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-9))).alias("f1"),
    )


def metric_f1(pred: DataFrame, gold: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """O5 ``MetricF1`` (predict.py:54-79) as ONE aggregate job.

    correct = |pred ∩ gold|, output = |pred|, golden = |gold| — all three
    from a single full-outer join + one aggregation, so the (expensive)
    ``pred`` pipeline executes exactly once (round 1 ran three separate
    ``.count()`` actions, each recomputing the full upstream — VERDICT.md
    item 2). P/R/F1 use the reference's max(·,1) guards. Returns one row:
    (correct, output, golden, precision, recall, f1).
    """
    keys = keys or ["url", "pred", "subj", "obj"]
    p = pred.select(*keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(*keys).distinct().withColumn("_g", F.lit(1))
    counts = (
        p.join(g, on=keys, how="full_outer")
        .agg(
            F.count(
                F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1)
            ).alias("correct"),
            F.count("_p").alias("output"),
            F.count("_g").alias("golden"),
        )
    )
    prec = F.col("correct") / F.greatest(F.col("output"), F.lit(1))
    rec = F.col("correct") / F.greatest(F.col("golden"), F.lit(1))
    return counts.select(
        "correct",
        "output",
        "golden",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-9))).alias("f1"),
    )


def to_ntriples(triples: DataFrame, base: str = "http://kg.example/") -> DataFrame:
    """Serialize (subj, pred, obj) triples as RDF N-Triples lines — the
    interchange form of the north-rule's "graph materialize" stage: the
    output a downstream triple store (Jena/Virtuoso/Blazegraph bulk
    loaders) ingests directly.

    Subjects and predicates become ``<base + percent-encoded-name>`` IRIs;
    objects are emitted as plain literals with the N-Triples string escapes
    (backslash, quote, newline, CR, tab — W3C N-Triples §2.3 ECHAR set).
    IRI encoding percent-escapes the characters N-Triples forbids inside
    ``<>`` (space, quote, angle brackets, backslash, %) — enough for this
    engine's entity vocabulary; a full RFC 3987 encoder is a drop-in.

    Pure codegen (fixed regexp_replace chains, RE2∩Java subset) — string
    formatting at scan speed, no UDF, one output row per input triple.
    """

    def iri(col: F.Column) -> F.Column:
        c = F.regexp_replace(col, "%", "%25")  # first: % itself
        for ch, enc in ((" ", "%20"), ('"', "%22"), ("<", "%3C"),
                        (">", "%3E"), ("\\\\", "%5C")):
            c = F.regexp_replace(c, ch if ch != "\\\\" else "\\\\", F.lit(enc))
        return c

    def lit_esc(col: F.Column) -> F.Column:
        c = F.regexp_replace(col, "\\\\", "\\\\\\\\")  # backslash first
        c = F.regexp_replace(c, '"', '\\\\"')
        c = F.regexp_replace(c, "\n", "\\\\n")
        c = F.regexp_replace(c, "\r", "\\\\r")
        c = F.regexp_replace(c, "\t", "\\\\t")
        return c

    return triples.select(
        "subj",
        "pred",
        "obj",
        F.concat(
            F.lit("<" + base), iri(F.col("subj")), F.lit("> "),
            F.lit("<" + base), iri(F.col("pred")), F.lit("> \""),
            lit_esc(F.col("obj")), F.lit('" .'),
        ).alias("ntriple"),
    )
