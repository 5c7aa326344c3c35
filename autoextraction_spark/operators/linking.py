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
    """The (pred, subj_type, obj_type) relation-schema dimension as a PURE
    JVM literal relation (r6): ``createDataFrame`` parallelizes pickled
    python rows, so every broadcast build of the dimension re-ran a
    32-task python stage (~0.3 s of worker dispatch for 10 rows, several
    builds per canonical query — measured via the event log's
    ``applySchemaToPythonRDD`` stages). ``inline(array(struct(...)))`` over
    ``range(1)`` folds to a LocalRelation: zero python, broadcast builds in
    milliseconds."""
    structs = [
        F.struct(
            F.lit(r).alias("pred"),
            F.lit(st).alias("subj_type"),
            F.lit(ot).alias("obj_type"),
        )
        for r, st, ot in S.RELATIONS
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


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


#: Driver fast-path bounds for canonical_mapping: the vocab must fit in
#: this many estimated driver bytes AND the blocked pair budget (Σ over
#: buckets of |bucket|²) must stay below _DRIVER_MAP_MAX_PAIRS — a
#: pathologically hot block falls back to the distributed join, which
#: produces the same pairs with AQE skew handling.
_DRIVER_MAP_MAX_BYTES = 16 * 2**20
_DRIVER_MAP_MAX_PAIRS = 2_000_000
#: CPython object overhead per vocab row (str headers + tuple/dict slots).
_DRIVER_MAP_ROW_OVERHEAD = 240


def _variant_pair_py(a: str, b: str) -> bool:
    """Python replica of ``is_variant_pair`` (token counts equal, every
    aligned pair equal or ≥3-char prefix-related). split(' ')/lower()/
    startswith match Spark's literal-space split, UTF8 lower and prefix
    semantics on this vocab; equivalence is pinned by tests and the oracle."""
    ta, tb = a.lower().split(" "), b.lower().split(" ")
    if len(ta) != len(tb):
        return False
    for x, y in zip(ta, tb):
        if x == y:
            continue
        if len(x) >= MIN_ABBREV_LEN and y.startswith(x):
            continue
        if len(y) >= MIN_ABBREV_LEN and x.startswith(y):
            continue
        return False
    return True


def _driver_canonical_mapping(rows: list) -> list:
    """Exact (ent_type, mention, canonical) rows at the driver: prefix-block
    (provably exhaustive for the verifier), verify within buckets,
    union-find, min-mention label. Components cannot span buckets — the
    block key is a function of the mention alone, so every verified pair
    shares it — but a single global union-find is simplest. Returns None
    never; caller guards the pair budget."""
    from collections import defaultdict

    buckets: dict = defaultdict(list)
    for ent_type, mention in rows:
        blk = " ".join(t[:MIN_ABBREV_LEN] for t in mention.lower().split(" "))
        buckets[(ent_type, blk)].append(mention)

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for (ent_type, _), ms in buckets.items():
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if _variant_pair_py(ms[i], ms[j]):
                    a, b = (ent_type, ms[i]), (ent_type, ms[j])
                    parent.setdefault(a, a)
                    parent.setdefault(b, b)
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[ra] = rb
    comp_min: dict = {}
    for k in parent:
        r = find(k)
        if r not in comp_min or k[1] < comp_min[r]:
            comp_min[r] = k[1]
    return [
        (et, m, comp_min[find((et, m))] if (et, m) in parent else m)
        for et, m in rows
    ]


def canonical_mapping(mentions: DataFrame, **kwargs) -> DataFrame:
    """(ent_type, mention, canonical) — canonical = lexicographically
    smallest variant in the connected component; identity for singletons.

    Hybrid execution (r6, the connected_components union-find precedent
    extended one stage up): the mention vocabulary is materialized once and
    sized with one agg job; when its estimated driver footprint fits
    ``_DRIVER_MAP_MAX_BYTES`` AND the blocked pair budget is bounded, the
    whole block → verify → CC → min-label chain runs at the driver in one
    collect (3 driver jobs total vs ~12 for the distributed chain — pure
    scheduling latency when the vocab is model-sized). Above either bound
    the distributed blocked-join + star-contraction path runs unchanged.
    Identical output by construction (cross-checked in tests and by the
    oracle)."""
    # materialize the vocab ONCE: it is scanned four times inside the
    # blocked-join plan (a/b sides + both verify lookups), again by the CC
    # node/edge checkpoints, and once more by the final left join — without
    # this every scan re-runs the upstream distinct over the triple table
    # (profiled at sf0.1: ~3.5s of pure recomputation on a 161-row vocab)
    mentions = mentions.localCheckpoint(eager=True)
    stats = mentions.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.avg(F.length("mention") + F.length("ent_type")), F.lit(0.0)
        ).alias("avg_bytes"),
    ).collect()[0]
    est_bytes = stats["n"] * (stats["avg_bytes"] + _DRIVER_MAP_ROW_OVERHEAD)
    if not kwargs and est_bytes <= _DRIVER_MAP_MAX_BYTES:
        rows = [(r["ent_type"], r["mention"]) for r in mentions.collect()]
        from collections import Counter

        blk_sizes = Counter(
            (et, " ".join(t[:MIN_ABBREV_LEN] for t in m.lower().split(" ")))
            for et, m in rows
        )
        if sum(c * c for c in blk_sizes.values()) <= _DRIVER_MAP_MAX_PAIRS:
            return mentions.sparkSession.createDataFrame(
                _driver_canonical_mapping(rows),
                "ent_type string, mention string, canonical string",
            )
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
