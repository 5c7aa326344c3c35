"""Stage E — entity linking: MinHash/LSH-blocked candidate generation over
triple mentions, exact-Jaccard verification, connected-components
canonicalization (north_rule stages E+F composed).

Flow (all DataFrame ops, one small shuffle chain over the MENTION vocabulary
— orders of magnitude smaller than the corpus):

    triples ──> typed mention vocab (subj ∪ obj, tagged with entity type)
            ──> char-3-gram shingles (lowercased)
            ──> MinHash signatures ──> LSH band join (blocked by entity type)
            ──> exact Jaccard ≥ threshold ──> variant edges
            ──> connected components ──> mention → canonical mapping
            ──> triples rewritten through the mapping (two broadcast joins)

Entity types come from the relation schema (a broadcast dimension), so
people never link to orgs even when surface-similar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema as S
from . import dedup
from .canonicalize import connected_components

NUM_PERM = 16
BANDS = 8  # r=2 rows/band: r=1 made the hottest band bucket quadratic at scale
MIN_ABBREV_LEN = 3


def rel_types(spark: SparkSession) -> DataFrame:
    rows = [(r, st, ot) for r, st, ot in S.RELATIONS]
    return spark.createDataFrame(rows, "pred string, subj_type string, obj_type string")


def mention_vocab(triples: DataFrame) -> DataFrame:
    """Distinct (mention, ent_type) across subject and object positions."""
    types = F.broadcast(rel_types(triples.sparkSession))
    t = triples.join(types, "pred")
    subj = t.select(F.col("subj").alias("mention"), F.col("subj_type").alias("ent_type"))
    obj = t.select(F.col("obj").alias("mention"), F.col("obj_type").alias("ent_type"))
    return subj.union(obj).distinct()


def is_variant_pair(a: Column, b: Column) -> Column:
    """Precise verifier: same token count and every aligned token pair is
    equal or an abbreviation-prefix (≥3 chars) of the other —
    'Acme Corp' ~ 'Acme Corporation', but NOT 'Obsidian Corp' ~
    'Meridian Corp' (char-n-gram Jaccard alone cannot separate those:
    J('acme corp','acme corporation') = 0.50 < J('obsidian corp',
    'meridian corp') = 0.57, so a threshold verifier is unsound here)."""
    ta, tb = F.split(F.lower(a), " "), F.split(F.lower(b), " ")
    tok_ok = F.forall(
        F.zip_with(
            ta,
            tb,
            lambda x, y: (x == y)
            | ((F.length(x) >= MIN_ABBREV_LEN) & y.startswith(x))
            | ((F.length(y) >= MIN_ABBREV_LEN) & x.startswith(y)),
        ),
        lambda ok: ok,
    )
    return (F.size(ta) == F.size(tb)) & tok_ok


def prefix_block_key(mention: Column) -> Column:
    """Blocking key that is provably EXHAUSTIVE for ``is_variant_pair``:
    the space-joined first-``MIN_ABBREV_LEN`` chars of each lowercased token.
    Any pair the verifier accepts has equal token counts and every aligned
    token pair equal or prefix-related with the shorter ≥3 chars — either
    way the first 3 chars agree, so both mentions share this key."""
    toks = F.split(F.lower(mention), " ")
    return F.concat_ws(" ", F.transform(toks, lambda t: F.substring(t, 1, MIN_ABBREV_LEN)))


def variant_edges(
    mentions: DataFrame,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    blocker: str = "prefix",
) -> DataFrame:
    """(src, dst) edges between surface variants of the same entity.

    Candidate BLOCKING (the scale mechanism — never all-pairs over a
    web-scale mention vocabulary) has two modes; the precise
    abbreviation-variant predicate is always the verifier:

    - ``prefix`` (default): equi-join on ``prefix_block_key`` + ent_type.
      Exhaustive for this verifier (zero recall loss, see key docstring) and
      far more selective than an LSH band bucket — buckets only hold
      mentions agreeing on EVERY token's 3-char prefix.
    - ``lsh``: MinHash/LSH banding over lowercase char-3-grams
      (dedup.lsh_candidate_pairs, 8 bands × r=2). The general-similarity
      blocker — the right choice when the verifier widens beyond
      abbreviation-prefix pairs (edit distance, token reorderings), at the
      cost of probabilistic recall.
    """
    keyed = mentions.select(
        F.concat_ws("\x1f", "ent_type", "mention").alias("key"),
        "ent_type",
        "mention",
        F.lower(F.col("mention")).alias("norm"),
    )
    if blocker == "lsh":
        shingled = dedup.exploded_shingles(
            keyed, "key", dedup.char_shingles(F.col("norm"), 3)
        )
        sig = dedup.minhash_signature(shingled, num_perm).join(
            keyed.select(F.col("key").alias("id"), "ent_type"), "id"
        )
        cands = dedup.lsh_candidate_pairs(sig, num_perm, bands, block_col="ent_type")
    else:
        blocked = keyed.select(
            F.col("key").alias("id"), "ent_type", prefix_block_key(F.col("mention")).alias("blk")
        )
        a = blocked.select(F.col("id").alias("id_a"), "ent_type", "blk")
        b = blocked.select(F.col("id").alias("id_b"), "ent_type", "blk")
        cands = (
            a.join(b, ["ent_type", "blk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
    ka = keyed.select(F.col("key").alias("id_a"), F.col("mention").alias("m_a"))
    kb = keyed.select(F.col("key").alias("id_b"), F.col("mention").alias("m_b"))
    verified = (
        cands.join(ka, "id_a")
        .join(kb, "id_b")
        .filter(is_variant_pair(F.col("m_a"), F.col("m_b")))
    )
    return verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))


def canonical_mapping(mentions: DataFrame, **kwargs) -> DataFrame:
    """(ent_type, mention, canonical) — canonical = lexicographically
    smallest variant in the connected component; identity for singletons."""
    # materialize the vocab ONCE: it is scanned four times inside the
    # blocked-join plan (a/b sides + both verify lookups), again by the CC
    # node/edge checkpoints, and once more by the final left join — without
    # this every scan re-runs the upstream distinct over the triple table
    # (profiled at sf0.1: ~3.5s of pure recomputation on a 161-row vocab)
    mentions = mentions.localCheckpoint(eager=True)
    edges = variant_edges(mentions, **kwargs)
    # check_every=2: the convergence probe is count + exceptAll (2 driver
    # jobs); probing every other round saves ~30% of driver actions on deep
    # graphs while the round count stays O(log n) + at most 1
    cc = connected_components(edges, check_every=2)
    keyed = mentions.select(
        F.concat_ws("\x1f", "ent_type", "mention").alias("node"), "ent_type", "mention"
    )
    return (
        keyed.join(cc, "node", "left")
        .select(
            "ent_type",
            "mention",
            F.coalesce(
                F.element_at(F.split(F.col("component"), "\x1f", 2), 2),
                F.col("mention"),
            ).alias("canonical"),
        )
    )


def canonical_triples(triples: DataFrame, mapping: DataFrame | None = None) -> DataFrame:
    """Rewrite (subj, obj) through the canonical mapping; distinct output.

    The mapping is a mention-vocabulary-sized table — broadcast both joins;
    the big triple table is never shuffled.
    """
    if mapping is None:
        # triples feed the vocab AND the rewrite — materialize once instead
        # of recomputing the upstream pipeline twice; same for the mapping
        # (vocabulary-sized), whose plan would otherwise re-run per
        # broadcast build below
        triples = triples.localCheckpoint(eager=True)
        mapping = canonical_mapping(mention_vocab(triples)).localCheckpoint(
            eager=True
        )
    types = F.broadcast(rel_types(triples.sparkSession))
    m = F.broadcast(mapping)
    t = triples.join(types, "pred")
    t = (
        t.join(
            m.withColumnsRenamed(
                {"ent_type": "subj_type", "mention": "subj", "canonical": "subj_canon"}
            ),
            ["subj_type", "subj"],
            "left",
        )
        .join(
            m.withColumnsRenamed(
                {"ent_type": "obj_type", "mention": "obj", "canonical": "obj_canon"}
            ),
            ["obj_type", "obj"],
            "left",
        )
    )
    return t.select(
        "url",
        "pred",
        F.coalesce("subj_canon", "subj").alias("subj"),
        F.coalesce("obj_canon", "obj").alias("obj"),
    ).distinct()
