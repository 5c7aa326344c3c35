"""Stage B — relation detection gate (reference operator E1).

Mirrors predict.py:135-146: a cheap classifier scores every relation per
document; only (doc, relation) pairs with sigmoid(logit) > 0.6 reach the
expensive ordered extractor. This is the engine's predicate-pushdown analog
(SURVEY.md §4): the gate runs BEFORE the fork loop and prunes its input.

Spark-first: the deterministic detector is a broadcast cross join of the tiny
relation-anchor dimension (|relations| × |langs| rows) against the corpus,
scored entirely with JVM/codegen expressions (``instr``/``when``/``exp``) —
no UDF in this hot path, and Catalyst keeps the text-column scan pruned to
(url, text, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema as S

RC_PRIMARY_LOGIT = 2.5   # sigmoid -> 0.924
RC_ALT_LOGIT = 1.5       # sigmoid -> 0.817
RC_MISS_LOGIT = -3.0     # sigmoid -> 0.047
RC_THRESHOLD = 0.6       # reference gate, predict.py:19


def relation_anchors(spark: SparkSession) -> DataFrame:
    """Tiny dimension table: (lang, rel, primary_anchor, alt_anchor)."""
    rows = []
    for rel, _, _ in S.RELATIONS:
        en = S.EN_TEMPLATES[rel]
        rows.append(("en", rel, en[0][0], en[1][0] if len(en) > 1 else None))
        zh = S.ZH_TEMPLATES[rel]
        rows.append(("zh", rel, zh[0][0], None))
    for etype, ev in S.EVENTS.items():
        rows.append((ev["lang"], etype, ev["anchor"], None))
    return spark.createDataFrame(
        rows, "lang string, rel string, primary_anchor string, alt_anchor string"
    )


def detect_relations(pages: DataFrame, threshold: float = RC_THRESHOLD) -> DataFrame:
    """(url, text, lang) -> (url, text, lang, rel, rc_score), gated.

    One broadcast nested-loop join against 10 anchor rows, then a codegen'd
    scoring expression — the 100 TB plan is a single scan + filter.
    """
    spark = pages.sparkSession
    anchors = F.broadcast(relation_anchors(spark))
    logit = (
        F.when(F.instr(F.col("text"), F.col("primary_anchor")) > 0, F.lit(RC_PRIMARY_LOGIT))
        .when(
            F.col("alt_anchor").isNotNull()
            & (F.instr(F.col("text"), F.col("alt_anchor")) > 0),
            F.lit(RC_ALT_LOGIT),
        )
        .otherwise(F.lit(RC_MISS_LOGIT))
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        pages.join(anchors, on="lang", how="inner")
        .withColumn("rc_score", score)
        .filter(F.col("rc_score") > threshold)
        .select("url", "text", "lang", "rel", "rc_score")
    )
