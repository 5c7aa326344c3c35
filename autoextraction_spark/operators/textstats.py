"""Text-analysis operators for a training-data pipeline (engine-new):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure JVM/codegen expressions (zero UDFs) so they run at scan speed and
every one has a DuckDB oracle. At 100 TB these are the per-document map
stages that must never leave whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenization: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[.,;:!?'\"()\\[\\]{}-]"
# literal CJK range chars: \uXXXX escapes are Java-regex-only (RE2 uses
# \x{...}), literal characters parse identically in both dialects
CJK_RE = "[一-鿿]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]

# distinctive-marker stopwords per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "es": ["el", "que", "los"],
    "fr": ["le", "et", "les"],
}


def _word_count(col: Column, word: str) -> Column:
    # count whole-word occurrences via regexp with word boundaries
    return F.regexp_count(col, F.lit(f"\\b{word}\\b"))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars, n_ws_tokens (whitespace), n_bpe_tokens (regex)."""
    t = F.col(text_col)
    return (
        df.withColumn("n_chars", F.length(t).cast("long"))
        .withColumn("n_ws_tokens", F.size(F.split(t, "\\s+")).cast("long"))
        .withColumn("n_bpe_tokens", F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("long"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality features + composite score.

    The composite mirrors common web-corpus filters (Gopher/C4-style): long
    enough, not punctuation-soup, contains stopwords (real prose does).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(t, "\\s+"))
    n_punct = F.regexp_count(t, F.lit(PUNCT_RE))
    n_stop = None
    for w in STOPWORDS:
        c = _word_count(t, w)
        n_stop = c if n_stop is None else n_stop + c
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    avg_tok_len = n_chars / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when(n_tokens >= 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((avg_tok_len >= 3) & (avg_tok_len <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("avg_token_len", F.round(avg_tok_len, 6))
        .withColumn("quality", F.round(score, 6))
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK presence → zh, else argmax of
    language-marker stopword counts (ties broken by fixed language order)."""
    t = F.col(text_col)
    counts: dict[str, Column] = {}
    for lang, words in LANG_MARKERS.items():
        cnt = None
        for w in words:
            c = _word_count(t, w)
            cnt = c if cnt is None else cnt + c
        counts[lang] = cnt
    mx = F.greatest(*counts.values())
    pred = F.when(F.regexp_count(t, F.lit(CJK_RE)) > 0, F.lit("zh")).when(
        mx == 0, F.lit("und")
    )
    for lang in LANG_MARKERS:  # insertion order = tie-break priority
        pred = pred.when(counts[lang] == mx, F.lit(lang))
    return df.withColumn("lang_pred", pred)


def containment_audit(
    df: DataFrame,
    args_col: str | Column = "args",
    text_col: str = "text",
    seg_re: str = "\n",
    boundary: bool = False,
    out_col: str = "passed",
) -> DataFrame:
    """P13 argument-containment data-quality audit (reference test.py:7-27):
    a row passes iff SOME ``seg_re``-split segment of ``text_col`` contains
    EVERY string in ``args_col`` (array<string>).

    Defaults mirror the reference exactly: newline segmentation, plain
    substring containment (``arg in seg``). ``boundary=True`` requires each
    arg to be whitespace-token-bounded inside the segment (space-padded
    containment) — the stricter mode for space-delimited languages, where
    plain substring containment cannot distinguish 'Acme Corp' inside
    'Acme Corporation'. Pure JVM ``exists``/``forall`` — no UDF, stays in
    codegen at 100 TB scan speed.
    """
    segs = F.split(F.col(text_col), seg_re)
    args = F.col(args_col) if isinstance(args_col, str) else args_col

    def arg_in(seg: Column, arg: Column) -> Column:
        if boundary:
            return F.contains(
                F.concat(F.lit(" "), seg, F.lit(" ")),
                F.concat(F.lit(" "), arg, F.lit(" ")),
            )
        return F.contains(seg, arg)

    passed = F.exists(segs, lambda s: F.forall(args, lambda a: arg_in(s, a)))
    return df.withColumn(out_col, passed)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (portable) + a 31-polynomial rolling hash over characters (Spark-side;
    rolling hashes are the building block for content-defined chunking)."""
    t = F.col(text_col)
    norm = F.lower(F.regexp_replace(t, "\\s+", " "))
    rolling = F.aggregate(
        F.split(norm, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.coalesce(F.ascii(c), F.lit(0))) % 2147483647,
    )
    return df.withColumn("fp_md5", F.md5(norm)).withColumn("fp_rolling", rolling)
