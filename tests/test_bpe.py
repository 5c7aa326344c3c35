"""BPE tokenizer training (operators/bpe.py) vs a pure-Python canonical
reference, plus the documented run-semantics edge cases."""

import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import bpe


def _py_bpe(words: dict[str, int], n_merges: int):
    """Canonical greedy BPE (Sennrich et al. 2016) on symbol tuples —
    independent of the string-replace formulation under test."""
    vocab = {tuple(w) + (bpe.END_OF_WORD,): f for w, f in words.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # max count, ties by lexicographic pair order
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((" ".join(pair), "".join(pair), counts[pair]))
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges, vocab


CORPUS = [
    "low low low lower lower lowest",
    "new newer newest low new wider wide",
    "the new low bid and the newer wide one",
]


def _word_counts(lines):
    c: dict[str, int] = {}
    for ln in lines:
        for w in ln.split(" "):
            if w:
                c[w] = c.get(w, 0) + 1
    return c


def test_bpe_train_matches_canonical_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        r["step"]: (r["pair"], r["merged"], r["cnt"])
        for r in bpe.bpe_train(df, n_merges=6).collect()
    }
    ref, _ = _py_bpe(_word_counts(CORPUS), 6)
    assert got == {i + 1: m for i, m in enumerate(ref)}


def test_bpe_vocab_matches_canonical_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        r["token"]: (r["freq"], r["n_words"])
        for r in bpe.bpe_subword_vocab(df, n_merges=6).collect()
    }
    _, vocab = _py_bpe(_word_counts(CORPUS), 6)
    ref: dict[str, list[int]] = {}
    for syms, f in vocab.items():
        for s in syms:
            e = ref.setdefault(s, [0, 0])
            e[0] += f
        for s in set(syms):
            ref[s][1] += 1
    assert got == {t: tuple(v) for t, v in ref.items()}


def test_bpe_handles_same_pair_runs(spark):
    """'aaaa' is a run of 3 'a a' occurrences — the 3-pass rewrite must
    fuse them exactly like canonical left-to-right greedy merging
    ([aa, aa] after merge 1)."""
    df = spark.createDataFrame([("aaaa aaaa b",)], "text string")
    rows = bpe.bpe_train(df, n_merges=3).collect()
    assert (rows[0]["pair"], rows[0]["merged"], rows[0]["cnt"]) == ("a a", "aa", 6)
    # after fusing 'a a', 'aaaa' is [aa, aa, </w>] — so 'aa aa' and
    # 'aa </w>' tie at 2 and '<' sorts before 'a': 'aa </w>' wins step 2,
    # 'aa aa</w>' (count 2, from both [aa, aa</w>] words) wins step 3.
    # Canonical reference agrees — the run WAS fused pairwise in step 1.
    assert (rows[1]["pair"], rows[1]["merged"]) == ("aa </w>", "aa</w>")
    assert (rows[2]["pair"], rows[2]["merged"], rows[2]["cnt"]) == (
        "aa aa</w>", "aaaa</w>", 2)
    ref, _ = _py_bpe({"aaaa": 2, "b": 1}, 3)
    assert [(r["pair"], r["merged"], r["cnt"]) for r in rows] == ref


def test_bpe_no_cross_word_or_cross_symbol_merges(spark):
    """A pair must only fuse where BOTH symbols match exactly: 'w' inside
    'wq' or at a word boundary must survive a ('o','w') merge."""
    df = spark.createDataFrame([("ow ow ow owq qow",)], "text string")
    merges, vocab = _py_bpe(_word_counts(["ow ow ow owq qow"]), 3)
    got_rows = bpe.bpe_train(df, n_merges=3).collect()
    got = [(r["pair"], r["merged"], r["cnt"]) for r in got_rows]
    assert got == merges


def test_bpe_raises_when_fully_merged(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    # 'a b </w>' has 2 pairs; after 2 merges the word is one symbol
    with pytest.raises(ValueError, match="no adjacent pairs"):
        bpe.bpe_train(df, n_merges=3).collect()


def test_bpe_all_columns_integer_exact(spark):
    """No floats anywhere in the trainer output (the no-quantization
    property the oracle parity relies on)."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    out = bpe.bpe_train(df, n_merges=2)
    assert dict(out.dtypes) == {
        "step": "int", "pair": "string", "merged": "string", "cnt": "bigint"
    }


def test_bpe_fertility_per_stratum(spark):
    df = spark.createDataFrame(
        [("en", "low low lower"), ("de", "lowest lowest")],
        "lang string, text string",
    )
    got = {
        r.stratum: (r.n_words, r.n_subwords, r.fertility)
        for r in bpe.bpe_fertility(df, n_merges=3, stratum_col="lang").collect()
    }
    # independently recompute with the canonical reference
    _, vocab = _py_bpe({"low": 2, "lower": 1, "lowest": 2}, 3)
    segs = {"".join(s).replace(bpe.END_OF_WORD, ""): len(s) for s in vocab}
    en = 2 * segs["low"] + segs["lower"]
    de = 2 * segs["lowest"]
    assert got == {
        "en": (3, en, round(en / 3, 6)),
        "de": (2, de, round(de / 2, 6)),
    }
