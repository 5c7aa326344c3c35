"""Graph analytics over the materialized knowledge graph (engine-new;
consumes the north_rule's "(subj, pred, obj) triple materialization" stage):
entity degree statistics and PageRank on the subj→obj entity graph.

This is the first thing a KG consumer runs after construction — entity
importance ranks drive disambiguation priors, crawl prioritization, and
display ordering. The implementation is GraphFrames-style iterate-over-
DataFrames (the same shape as ``canonicalize.connected_components``): no
RDD API, no driver-side graph.

Scale shape (100 TB → billions of edges):
- the edge list and the (node, out_deg, in_deg, N) base table are each
  materialized ONCE (DISK_ONLY localCheckpoint) — every iteration re-reads
  the checkpoint, never the upstream extraction pipeline;
- one PageRank iteration = one equi-join ranks⋈edges on src + one
  groupBy(dst) partial-aggregated sum — both shuffles keyed by entity id,
  AQE-splittable under hub skew (celebrity entities are real skew);
- the dangling-node mass is a ONE-ROW aggregate crossJoined back
  (broadcast nested loop of a single row) — there is NO driver-side
  ``collect``/``first`` inside the loop, the whole fixed-depth iteration
  builds one lazy plan per round over the checkpointed previous round;
- fixed ``iters`` (the production norm for rank features) keeps the plan
  deterministic and lets the SQL oracle unroll the same iterations.

Reference tie-in: the reference stops at triple emission (predict.py:
144-154); ranking the resulting graph is engine-new (SURVEY.md engine-new
inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)


def _eager(df: DataFrame) -> DataFrame:
    """Eager DISK_ONLY checkpoint — the iterative-loop barrier: cuts lineage
    AND materializes now, so the per-round convergence probe (isEmpty) reads
    the checkpoint instead of re-running the round's joins."""
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def triple_edges(
    triples: DataFrame, src_col: str = "subj", dst_col: str = "obj"
) -> DataFrame:
    """Distinct (src, dst) entity edges from a triple table."""
    return triples.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()


def export_int_ids(triples: DataFrame) -> DataFrame:
    """Property-graph materialization with dense integer ids:
    ``(src_id, pred_id, dst_id)`` distinct edges, entity/relation ids
    assigned by vocabulary rank (binary name order). The hand-off format
    for GNN training / external graph engines, where string keys are
    wasted shuffle bytes.

    Ids come from fileops._with_rank — the JVM-side two-pass global rank
    (no single-task window, no zipWithIndex python round-trip); the two
    entity-vocab joins reuse ONE checkpointed rank table.
    """
    from .fileops import _with_rank

    t = _ckpt(triples.select("pred", "subj", "obj").distinct())
    ent_names = (
        t.select(F.col("subj").alias("name"))
        .union(t.select(F.col("obj").alias("name")))
        .distinct()
    )
    ents = _eager(
        _with_rank(ent_names, "name").select("name", F.col("_rn").alias("eid"))
    )
    rels = _with_rank(t.select(F.col("pred").alias("name")).distinct(), "name").select(
        "name", F.col("_rn").alias("pid")
    )
    return (
        t.join(ents.select(F.col("name").alias("subj"), F.col("eid").alias("src_id")), "subj")
        .join(F.broadcast(rels.select(F.col("name").alias("pred"), F.col("pid").alias("pred_id"))), "pred")
        .join(ents.select(F.col("name").alias("obj"), F.col("eid").alias("dst_id")), "obj")
        .select("src_id", "pred_id", "dst_id")
    )


def conjunctive_query(
    triples: DataFrame, patterns: list[tuple[str, str, str]]
) -> DataFrame:
    """Basic-graph-pattern (SPARQL-style) conjunctive query: each pattern is
    ``(subj_var, pred_literal, obj_var)``; shared variables join. Returns
    one column per distinct variable.

    Each pattern becomes a per-predicate filtered scan of the triple table
    (filter pushed into the shared, once-materialized plan) and every shared
    variable an equi-join key — Catalyst orders the joins; at web scale the
    triple table is bucketed by subj so var-on-subj joins co-locate.
    """
    if not patterns:
        raise ValueError("conjunctive_query requires at least one pattern")
    t = _ckpt(triples.select("pred", "subj", "obj").distinct())
    out = None
    seen: list[str] = []
    for sv, pred, ov in patterns:
        filtered = t.filter(F.col("pred") == pred)
        if sv == ov:
            # Self-loop pattern (?x pred ?x): one output column, the
            # subj == obj restriction folded into the scan — mirrors the
            # SQL oracle's alias.subj = alias.obj predicate.
            p = filtered.filter(F.col("subj") == F.col("obj")).select(
                F.col("subj").alias(sv)
            )
            pvars = [sv]
        else:
            p = filtered.select(F.col("subj").alias(sv), F.col("obj").alias(ov))
            pvars = [sv, ov]
        if out is None:
            out, seen = p, list(pvars)
        else:
            keys = [v for v in pvars if v in seen]
            out = out.join(p, keys) if keys else out.crossJoin(p)
            seen += [v for v in pvars if v not in seen]
    return out.distinct()


def schema_induction(
    triples: DataFrame, type_dicts: dict[str, list[str]]
) -> DataFrame:
    """Type-signature induction over the emitted KG: ``(pred, subj_type,
    obj_type, n_facts)`` with entity types inferred by dictionary
    membership (entities outside every dictionary report 'other') — the
    ontology audit a KG consumer runs first: one row per observed predicate
    signature, noisy extractions surface as off-signature rows.

    The type dictionaries are model artifacts (like the detect-stage anchor
    table): literal IN-sets folded into ONE codegen CASE expression — no
    join, no UDF; the whole operator is a single map + one partial-
    aggregated count keyed by the 3-column signature.
    """
    def type_expr(col: str) -> F.Column:
        e = F.lit("other")
        for tname, names in reversed(list(type_dicts.items())):
            e = F.when(F.col(col).isin(names), F.lit(tname)).otherwise(e)
        return e

    return (
        triples.select(
            "pred",
            type_expr("subj").alias("subj_type"),
            type_expr("obj").alias("obj_type"),
        )
        .groupBy("pred", "subj_type", "obj_type")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )


def shared_neighbor_similarity(
    edges: DataFrame, min_shared: int = 2
) -> DataFrame:
    """Related-entity pairs by out-neighborhood overlap: ``(a, b, shared,
    jaccard)`` for unordered pairs sharing ≥ ``min_shared`` out-neighbors —
    the classic co-citation / "entities like this one" KG feature.

    The wedge self-join is keyed by the shared NEIGHBOR (dst): two sources
    pair once per common neighbor, then one count-aggregation per pair.
    Hub dst nodes fan out quadratically — the same celebrity-skew surface
    as the dedup family's band buckets — so at web scale the dst side is
    capped first (drop objects above an in-degree ceiling, exactly the
    stop-shingle rule in minhash blocking); here the synthetic graph's max
    in-degree is vocabulary-bounded and the cap is unnecessary. Jaccard is
    rounded to 6 decimals for the SQL oracle (float-division parity).
    """
    e = _eager(edges.select("src", "dst").distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    a = e.select(F.col("src").alias("a"), "dst")
    b = e.select(F.col("src").alias("b"), "dst")
    pairs = (
        a.join(b, "dst")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(deg.select(F.col("src").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("src").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "shared",
            F.round(
                F.col("shared") / (F.col("da") + F.col("db") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


def rule_inference(
    triples: DataFrame, rules: list[tuple[str, str, str]]
) -> DataFrame:
    """Single-hop rule-join inference over a (subj, pred, obj) triple table:
    for every rule ``(pa, pb, out)`` emit ``(s, out, o)`` whenever
    ``(s, pa, x)`` and ``(x, pb, o)`` both hold — e.g.
    ``works_for ∘ based_in ⇒ employed_in``. The standard OWL-property-chain /
    Datalog-body-of-2 materialization step every KG consumer derives first.

    Scale shape: each rule is ONE equi-join keyed on the shared entity ``x``
    (shuffle on entity id, AQE-splittable under hub skew); the per-predicate
    filters sit directly above the scan so Catalyst pushes them into the
    triple source, and the rule outputs are unioned lazily (one stage each).
    The input plan is materialized once and shared by every rule.

    Reference tie-in: the reference stops at triple emission
    (predict.py:144-154); downstream inference is engine-new.
    """
    if not rules:
        raise ValueError("rule_inference requires at least one rule")
    t = _ckpt(triples.select("subj", "pred", "obj"))
    out = None
    for pa, pb, new_pred in rules:
        a = t.filter(F.col("pred") == pa).select(
            F.col("subj").alias("s"), F.col("obj").alias("x")
        )
        b = t.filter(F.col("pred") == pb).select(
            F.col("subj").alias("x"), F.col("obj").alias("o")
        )
        inferred = (
            a.join(b, "x")
            .select(
                F.col("s").alias("subj"),
                F.lit(new_pred).alias("pred"),
                F.col("o").alias("obj"),
            )
            .distinct()
        )
        out = inferred if out is None else out.union(inferred)
    return out


def transitive_closure(edges: DataFrame, max_depth: int = 8) -> DataFrame:
    """Semi-naive transitive closure of a (src, dst) edge list:
    ``(src, dst, depth)`` for every pair reachable in ≤ ``max_depth`` hops,
    ``depth`` = the BFS-minimal hop count. The KG ownership/part-of/subclass
    materialization (here: ``acquired`` chains — who transitively controls
    whom).

    Semi-naive Datalog evaluation (the textbook fixpoint): only the LAST
    round's newly-discovered pairs join against the base edges, and an
    anti-join against the accumulated closure keeps rediscovered pairs from
    re-entering the frontier — so on a cyclic graph the frontier still
    drains and every pair is emitted exactly once, at its minimal depth.

    Scale shape (billions of edges): the base edge set is materialized ONCE
    (eager DISK_ONLY checkpoint) and every round re-reads it; each round is
    one equi-join (frontier.dst = edges.src) + one left_anti join, both
    shuffles keyed by entity id; per-round eager checkpoints cut lineage AND
    provide the frontier-empty convergence probe (one count job per round —
    the same cadence as connected_components). Depth is capped by
    ``max_depth`` so the plan and its SQL oracle enumerate the identical
    pair universe; production closures over deep hierarchies raise the cap
    or switch to the O(log d) doubling variant at the cost of join width.
    """
    e = _eager(edges.select("src", "dst").distinct())
    paths = e.withColumn("depth", F.lit(1))
    known = e
    frontier = paths
    for d in range(2, max_depth + 1):
        nxt = _eager(
            frontier.alias("p")
            .join(e.alias("q"), F.col("p.dst") == F.col("q.src"))
            .select(F.col("p.src").alias("src"), F.col("q.dst").alias("dst"))
            .distinct()
            .join(known, ["src", "dst"], "left_anti")
            .withColumn("depth", F.lit(d))
        )
        if nxt.isEmpty():
            break
        paths = paths.union(nxt)
        known = _ckpt(known.union(nxt.select("src", "dst")))
        frontier = nxt
    return paths


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 6
) -> DataFrame:
    """Minimal hop distance ``(node, dist)`` from a seed set over directed
    (src, dst) edges — dist 0 for the seeds themselves, capped at
    ``max_depth``. The neighborhood-expansion primitive under KG-based
    retrieval (seed entities → n-hop evidence subgraph).

    Same semi-naive shape as :func:`transitive_closure` but the state is a
    node set, not a pair set: each round joins ONLY the last frontier
    against the checkpointed edge base and anti-joins the visited set, so a
    node is emitted once, at its BFS-minimal depth. Seeds are a DataFrame —
    at production scale the seed list is itself query output (millions of
    nodes), never a driver-side literal list.
    """
    e = _eager(edges.select("src", "dst").distinct())
    visited = _eager(seeds.select("node").distinct().withColumn("dist", F.lit(0)))
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = _eager(
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), ["node"], "left_anti")
            .withColumn("dist", F.lit(d))
        )
        if nxt.isEmpty():
            break
        visited = _eager(visited.union(nxt))
        frontier = nxt
    return visited


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-entity triangle participation counts ``(entity, triangles)`` over
    the UNDIRECTED entity graph (predicates collapsed; only entities in ≥1
    triangle are emitted). The clustering/community-density signal for KG
    quality audits — extraction noise shows up as triangle-free stars.

    Degree-ordered orientation (the MapReduce-standard trick): every
    undirected edge is oriented from the (degree, id)-smaller endpoint to
    the larger, making the join DAG acyclic so each triangle is enumerated
    EXACTLY once, and bounding the wedge fan-out by O(m^1.5) total — the
    high-degree hub never fans out its full neighborhood, because almost
    all of its edges point INTO it. Two equi-joins keyed by entity id; the
    oriented edge set is materialized once and drives all three legs.

    The SQL oracle orients lexicographically instead — any acyclic
    orientation enumerates the same triangle SET, so the per-node counts
    must match even though the physical join tree differs; the comparison
    therefore also guards the orientation logic itself.
    """
    # materialize BEFORE the fan-out: und feeds deg (twice, as du/dv) and
    # the orientation join — unmaterialized, the upstream extraction plan
    # would execute 5× inside the oriented-checkpoint job (this hides from
    # the final-plan scan audit, which only sees the post-checkpoint reads)
    und = _eager(
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    oriented = _eager(
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("u")
            ).otherwise(F.col("v")).alias("a"),
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("v")
            ).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    # checkpoint the enumerated triangles: the 3-branch membership union
    # below would otherwise re-run the two-join enumeration once per branch
    tri = _ckpt(e1.join(e2, "y").join(e3, ["x", "z"]))
    members = (
        tri.select(F.col("x").alias("entity"))
        .union(tri.select(F.col("y").alias("entity")))
        .union(tri.select(F.col("z").alias("entity")))
    )
    return members.groupBy("entity").agg(F.count(F.lit(1)).alias("triangles"))


def hash_random_walks(edges: DataFrame, steps: int = 3) -> DataFrame:
    """DeepWalk-style walk-corpus generation with HASH-derandomized next-hop
    choice: from every node, one walk of ``steps`` hops where the step-k
    successor of v is ``argmin_u md5(v ‖ k ‖ u)`` over v's out-neighbors —
    a uniform-looking but fully deterministic choice, so the corpus is
    retry-stable, resumable, and SQL-replayable (the same reason
    mixture_sample uses integer hash thresholds instead of rand()). A
    production run varies walks per node by salting the hash with a walk
    index — same plan, one more literal.

    Output: (start, step, node) path rows — step 0 is the start node; walks
    stop early at sink nodes (no out-edges). Per step: ONE frontier⋈edges
    equi-join + the portable two-step argmin (min hash per walk position,
    then join back) — no window over the neighbor lists, no RNG. The edge
    set is checkpointed once; each frontier is checkpointed (same loop
    discipline as transitive_closure).
    """
    e = _eager(edges.select("src", "dst").distinct())
    frontier = e.select(F.col("src").alias("start")).distinct().select(
        "start", F.col("start").alias("node")
    )
    out = frontier.withColumn("step", F.lit(0))
    for k in range(1, steps + 1):
        cand = _eager(
            frontier.join(e, frontier.node == e.src).select(
                "start",
                F.col("dst").alias("nxt"),
                F.md5(
                    F.concat_ws(":", F.col("node"), F.lit(str(k)), F.col("dst"))
                ).alias("h"),
            )
        )
        best = cand.groupBy("start").agg(F.min("h").alias("h"))
        frontier = _eager(
            cand.join(best, ["start", "h"]).select(
                "start", F.col("nxt").alias("node")
            )
        )
        if frontier.isEmpty():
            # All walks hit sink nodes — same early exit as
            # transitive_closure/bfs_distances; empty frontiers contribute
            # no rows, so SQL-oracle parity is unaffected.
            break
        out = out.union(frontier.withColumn("step", F.lit(k)))
    return out


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over the
    UNDIRECTED entity graph: every node starts labeled with itself; each
    round it adopts the most frequent label among its neighbors, ties
    broken by minimal label. Fixed ``iters`` rounds (the production norm
    for community features, and what lets the SQL oracle unroll the same
    trajectory — sync LPA may oscillate on bipartite structures, so a
    convergence loop would not be deterministic across engines anyway).

    The argmax is engine-portable by construction: max count per node, then
    min label at that count — two aggregations and one join, no
    struct-ordering or first()-in-group semantics that differ between
    engines. Per round: one neighbor-label equi-join keyed by node + three
    keyed aggregations, all partial-aggregated; the symmetrized edge set is
    checkpointed once.
    """
    sym = _eager(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iters):
        labels = _ckpt(labels)
        nbr = sym.join(labels.withColumnRenamed("node", "v"), "v").select(
            F.col("u").alias("node"), "label"
        )
        counts = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        maxc = counts.groupBy("node").agg(F.max("cnt").alias("cnt"))
        labels = (
            counts.join(maxc, ["node", "cnt"])
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
    return labels.select(F.col("node").alias("entity"), F.col("label").alias("community"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling) mass returns to the
    SEED set uniformly instead of to all nodes — "importance relative to
    these entities", the ranking behind seeded KG exploration and
    related-entity panels.

        r_{k+1}(v) = (1−d)·[v∈S]/|S| + d·( Σ_{u→v} r_k(u)/out(u)
                                           + [v∈S]/|S| · Σ_{out(u)=0} r_k(u) )

    ``r_0 = [v∈S]/|S|``. Same physical shape as :func:`entity_pagerank`
    (checkpointed base, one rank⋈edges equi-join + one groupBy(dst) per
    round, dangling mass as a crossJoined 1-row aggregate); the seed
    indicator is one extra left join on the base table, folded into the
    update expression as a 0/1 column. Ranks round to 6 decimals for the
    SQL oracle."""
    edges = _ckpt(edges.select("src", "dst").distinct())
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    s = seeds.select(F.col("node")).distinct().withColumn("is_seed", F.lit(1.0))
    base = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left")
        .join(s, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("is_seed"), F.lit(0.0)).alias("is_seed"),
        )
    )
    ns = base.agg(F.sum("is_seed").alias("ns"))
    base = _ckpt(base.crossJoin(F.broadcast(ns)))

    d = float(damping)
    omd = 1.0 - d
    # greatest(ns, 1): with NO seed present in the graph every is_seed is 0
    # and the division would yield NaN everywhere; the guard makes the
    # result all-zero ppr instead (and is a no-op whenever ns ≥ 1)
    safe_ns = F.greatest(F.col("ns"), F.lit(1.0))
    ranks = base.withColumn("rank", F.col("is_seed") / safe_ns)
    for _ in range(iters):
        ranks = _ckpt(ranks)
        dang = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        contrib = (
            ranks.filter(F.col("out_deg") > 0)
            .join(edges, ranks.node == edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("m"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "out_deg",
                "is_seed",
                "ns",
                (
                    F.lit(omd) * F.col("is_seed") / safe_ns
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("m"), F.lit(0.0))
                        + F.col("is_seed") * F.col("dang") / safe_ns
                    )
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("entity"), F.round(F.col("rank"), 6).alias("ppr")
    )


def entity_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    materialize: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """(entity, out_deg, in_deg, pagerank) over a distinct (src, dst) edge
    list.

    Standard damped PageRank with uniform dangling-mass redistribution:

        r_{k+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_k(u)/out_deg(u)
                                     + Σ_{u: out_deg(u)=0} r_k(u) / N )

    ``r_0 = 1/N``; ``pagerank`` is rounded to 6 decimals so the SQL oracle's
    (order-insensitive) float sums compare exactly.

    ``weight_col`` (optional, positive INTEGER weights — e.g. link
    counts; the out-strength is carried as a long): weighted PageRank —
    each edge carries a transition weight, a walker leaves u along u→v
    with probability w(u,v)/W(u), W(u) = Σ out-weights. ``out_deg`` in
    the output stays the plain edge count; dangling = no out-edges, same
    as unweighted. The unweighted path is bit-identical to before the
    parameter existed.
    """
    ck = _ckpt if materialize else (lambda df: df)
    edges = ck(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if weight_col is None:
        outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    else:
        outdeg = edges.groupBy("src").agg(
            F.count(F.lit(1)).alias("out_deg"),
            F.sum(weight_col).alias("out_w"),
        )
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    base_cols = [
        "node",
        F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
    ]
    if weight_col is not None:
        base_cols.append(
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w")
        )
    base = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left")
        .join(indeg, nodes.node == indeg.dst, "left")
        .select(*base_cols)
    )
    # N rides along as a column (1-row agg crossJoined once): the loop body
    # needs it in expressions and must not collect it to the driver
    n_df = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    base = ck(base.crossJoin(F.broadcast(n_df)))

    d = float(damping)
    one_minus_d = 1.0 - d  # python float; the SQL oracle embeds repr() of this
    ranks = base.withColumn("rank", F.lit(1.0) / F.col("n"))
    for _ in range(iters):
        ranks = ck(ranks)
        dang = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        share = (
            F.col("rank") / F.col("out_deg")
            if weight_col is None
            else F.col("rank") * F.col(weight_col) / F.col("out_w")
        )
        contrib = (
            ranks.filter(F.col("out_deg") > 0)
            .join(edges, ranks.node == edges.src)
            .groupBy("dst")
            .agg(F.sum(share).alias("m"))
        )
        keep = ["node", "out_deg", "in_deg", "n"] + (
            ["out_w"] if weight_col is not None else []
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                *keep,
                (
                    F.lit(one_minus_d) / F.col("n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("m"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("entity"),
        "out_deg",
        "in_deg",
        F.round(F.col("rank"), 6).alias("pagerank"),
    )


def k_core(edges: DataFrame, k: int = 2, max_iter: int = 8) -> DataFrame:
    """k-core decomposition (Seidman 1983; the distributed peeling form of
    Montresor et al. 2013): the maximal subgraph in which every node has
    degree ≥ ``k`` over the UNDIRECTED version of the (src, dst) edge list.
    Returns ``(node, degree)`` for the surviving nodes, degree measured
    inside the core. The standard KG-quality primitive: low-core entities
    are extraction noise; the dense core is the trustworthy backbone.

    Peeling loop: drop nodes with degree < k, drop their incident edges,
    repeat to fixpoint. Each round is one map-side-combinable degree
    aggregation + two semi-joins keyed by entity id; per-round eager
    DISK_ONLY checkpoints cut lineage and provide the convergence probe
    (one count job per round — the transitive_closure cadence). Raises on
    non-convergence within ``max_iter`` instead of returning a non-core
    (the connected_components rule); the SQL oracle unrolls exactly
    ``max_iter`` rounds, which agrees because post-fixpoint rounds are
    no-ops.
    """
    sym = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    e = _eager(
        sym.unionByName(
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    for _ in range(max_iter):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        new_e = _eager(
            e.join(keep, "src", "left_semi").join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
        )
        if new_e.count() == e.count():
            return deg.filter(F.col("degree") >= k).select(
                F.col("src").alias("node"), F.col("degree")
            )
        e = new_e
    raise RuntimeError(
        f"k_core did not converge within {max_iter} iterations — raise "
        "max_iter (and extend the oracle's unroll to match)"
    )


def harmonic_centrality(edges: DataFrame, max_depth: int = 4) -> DataFrame:
    """Incoming harmonic centrality (Boldi & Vigna 2014, *Axioms for
    Centrality*): C(v) = Σ_{u reaches v, d ≤ max_depth} 1/d(u, v) — the
    centrality that stays well-defined on disconnected graphs (unreachable
    pairs contribute 0, no ∞ like closeness). The KG-importance signal for
    entity ranking next to PageRank, with hop-bounded semantics that match
    how retrieval actually explores a KG.

    Built ON :func:`transitive_closure` (the engine's semi-naive fixpoint;
    each pair carries its BFS-minimal depth), so the scale shape is the
    closure's: per-round entity-keyed equi-join + anti-join, eager
    DISK_ONLY checkpoints, then ONE map-side-combinable aggregation by
    target node. Returns (node, centrality, n_reaching); centrality rounds
    to 6 (float-sum ordering rule).
    """
    paths = transitive_closure(edges, max_depth=max_depth)
    return paths.groupBy(F.col("dst").alias("node")).agg(
        F.round(F.sum(1.0 / F.col("depth")), 6).alias("centrality"),
        F.count(F.lit(1)).alias("n_reaching"),
    )


def strongly_connected(edges: DataFrame, max_depth: int = 8) -> DataFrame:
    """Hop-bounded strongly connected components of the directed entity
    graph: node u and v share a component iff each reaches the other within
    ``max_depth`` hops. The directed complement to
    :func:`~autoextraction_spark.operators.canonicalize.connected_components`
    — on a KG, non-trivial SCCs are ownership/acquisition cycles and mutual
    part-of loops, exactly the structures a downstream reasoner must
    collapse before topological scheduling (cycle detection as a side
    effect: any scc_size > 1 is a directed cycle).

    Method: materialize the hop-bounded closure ONCE (the engine's
    semi-naive :func:`transitive_closure`, eagerly checkpointed), self-join
    it on reversed keys for mutual reachability, add every node's self-pair
    (a node is always in its own SCC), then ``scc_id = min`` mutually-
    reachable node per node — the same canonical-min labeling rule as the
    undirected CC operator. Output: (node, scc_id, scc_size).

    The hop cap makes the operator's pair universe identical to its SQL
    oracle's; cycles longer than ``max_depth`` would split (documented
    bound — KG ownership cycles are short, and the cap is generous at 8).
    Production-scale note: this materializes the bounded closure, which the
    cap keeps near-linear on sparse KGs; an unbounded web-scale SCC would
    switch to forward-backward trimming (Blelloch et al. 2016) on the same
    DataFrame skeleton.
    """
    cl = _eager(transitive_closure(edges, max_depth=max_depth).select("src", "dst"))
    mutual = (
        cl.alias("f")
        .join(
            cl.alias("b"),
            (F.col("f.src") == F.col("b.dst")) & (F.col("f.dst") == F.col("b.src")),
        )
        .select(F.col("f.src").alias("node"), F.col("f.dst").alias("peer"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pairs = mutual.union(nodes.select("node", F.col("node").alias("peer")))
    scc = _ckpt(pairs.groupBy("node").agg(F.min("peer").alias("scc_id")))
    sizes = scc.groupBy("scc_id").agg(F.count(F.lit(1)).alias("scc_size"))
    return scc.join(sizes, "scc_id").select("node", "scc_id", "scc_size")


def condensation_levels(
    edges: DataFrame, max_depth: int = 8, max_levels: int = 32
) -> DataFrame:
    """SCC condensation + topological levels — the scheduling table a
    reasoner derives from :func:`strongly_connected`: collapse each SCC to
    one node, then assign every condensation node its LONGEST-path depth
    from any root (a node with no incoming cross-SCC edge). Level L can be
    processed once levels < L are done, so the output is the parallel
    evaluation schedule for rule application over a cyclic KG.

    Method: map both edge endpoints through the SCC labels, drop intra-SCC
    edges, distinct — the condensation is a DAG by construction. Then BFS
    layers WITHOUT an anti-join: frontier_d = nodes with an incoming path
    of length exactly d from a root, so max d per node IS the longest-path
    level (re-visits at deeper depths are the point, unlike
    transitive_closure's minimal-depth semi-naive rule). The frontier
    drains in ≤ (longest path) rounds because the DAG has no cycles;
    ``max_levels`` is the converge-or-raise guard (k_core rule).

    Output: (node, scc_id, level) for every entity in the edge set.

    Scale shape: the SCC labeling is checkpointed once and both mapping
    joins are entity-keyed; each level round is ONE equi-join + distinct
    over the (small) condensation; per-round eager checkpoints provide the
    convergence probe.
    """
    scc = _eager(strongly_connected(edges, max_depth).select("node", "scc_id"))
    ce = _eager(
        edges.join(scc.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("scc_id", "c_src")
        .join(
            scc.withColumnRenamed("node", "dst").withColumnRenamed("scc_id", "c_dst"),
            "dst",
        )
        .filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .distinct()
    )
    nodes = scc.select(F.col("scc_id").alias("c")).distinct()
    roots = nodes.join(
        ce.select(F.col("dst").alias("c")).distinct(), "c", "left_anti"
    )
    arrivals = roots.withColumn("d", F.lit(0))
    frontier = arrivals
    for d in range(1, max_levels + 1):
        nxt = _eager(
            frontier.join(ce, frontier["c"] == ce["src"])
            .select(F.col("dst").alias("c"))
            .distinct()
            .withColumn("d", F.lit(d))
        )
        if nxt.isEmpty():
            break
        arrivals = arrivals.union(nxt)
        frontier = nxt
    else:
        raise ValueError(
            f"condensation deeper than max_levels={max_levels} "
            "(should be impossible on a DAG of this size — raise the cap)"
        )
    levels = arrivals.groupBy("c").agg(F.max("d").alias("level"))
    return scc.join(levels, scc["scc_id"] == levels["c"]).select(
        "node", "scc_id", "level"
    )


def entity_pmi(triples: DataFrame, url_col: str = "url") -> DataFrame:
    """Pointwise mutual information of entity pairs co-occurring on the
    same page — the distributional association signal next to the explicit
    KG edges (entities that co-occur far above chance but share no
    extracted triple are the relation-discovery / KG-completion candidates
    a curation team reviews).

        pmi(x, y) = ln( N · c_xy / (c_x · c_y) )

    over page-level co-occurrence counts: N = pages with ≥1 entity,
    c_x = pages mentioning x, c_xy = pages mentioning both. Output:
    (e1, e2, c_pair, pmi) for each unordered pair (e1 < e2), pmi rounded
    to 6 (ln is libm, the lm_perplexity 1-ulp rule).

    Scale shape: ONE distinct (page, entity) projection, checkpointed,
    feeds all three counts; the pair join is page-keyed, so its output is
    quadratic only in entities-per-page (bounded by extraction), never in
    corpus size; N is a 1-row broadcast crossJoin, the marginal joins are
    entity-keyed.
    """
    ue = _ckpt(
        triples.select(
            F.col(url_col).alias("u"),
            F.explode(F.array("subj", "obj")).alias("e"),
        ).distinct()
    )
    nn = ue.agg(F.count_distinct("u").cast("double").alias("n_docs"))
    cx = ue.groupBy("e").agg(F.count(F.lit(1)).alias("c"))
    pr = (
        ue.alias("a")
        .join(
            ue.alias("b"),
            (F.col("a.u") == F.col("b.u")) & (F.col("a.e") < F.col("b.e")),
        )
        .groupBy(F.col("a.e").alias("e1"), F.col("b.e").alias("e2"))
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    return (
        pr.join(cx.withColumnRenamed("e", "e1").withColumnRenamed("c", "c1"), "e1")
        .join(cx.withColumnRenamed("e", "e2").withColumnRenamed("c", "c2"), "e2")
        .crossJoin(F.broadcast(nn))
        .select(
            "e1",
            "e2",
            "c_pair",
            F.round(
                F.log(
                    F.col("n_docs") * F.col("c_pair")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def canonical_paths(edges: DataFrame, max_depth: int = 8) -> DataFrame:
    """Evidence paths: for every (src, dst) of the hop-bounded closure,
    ONE deterministic minimal-depth path rendered ``src->…->dst`` — the
    explanation a KG consumer shows next to an inferred fact ("who
    transitively controls whom, and through which chain").

    Canonicalization rule: per-hop greedy minimum — each BFS round keeps,
    per newly reached (src, node) pair, the lexicographically smallest
    path string among that round's arrivals, and only those survivors are
    extended. Deterministic and engine-independent by construction. (When
    node names contain characters ordering below ``'-'`` — e.g. spaces —
    the greedy choice is not always the GLOBAL lexicographic minimum over
    all min-depth paths; documented: the contract is "a canonical
    witness", chosen by a fixed rule, not a specific global extremum.)

    Scale shape: the closure's semi-naive discipline (new pairs only via
    anti-join against known pairs, per-round eager checkpoints, edge set
    materialized once) with ONE extra per-round map-side-combinable
    min(path) aggregation; path strings carried only for surviving pairs,
    so state is O(closure), never O(all paths).
    """
    e = _eager(edges.select("src", "dst").distinct())
    p = e.select(
        "src", "dst", F.concat(F.col("src"), F.lit("->"), F.col("dst")).alias("path")
    ).withColumn("depth", F.lit(1))
    paths = p
    known = e
    frontier = p
    for d in range(2, max_depth + 1):
        nxt = _eager(
            frontier.alias("p")
            .join(e.alias("q"), F.col("p.dst") == F.col("q.src"))
            .select(
                F.col("p.src").alias("src"),
                F.col("q.dst").alias("dst"),
                F.concat(F.col("p.path"), F.lit("->"), F.col("q.dst")).alias("path"),
            )
            .join(known, ["src", "dst"], "left_anti")
            .groupBy("src", "dst")
            .agg(F.min("path").alias("path"))
            .withColumn("depth", F.lit(d))
        )
        if nxt.isEmpty():
            break
        paths = paths.union(nxt)
        known = _ckpt(known.union(nxt.select("src", "dst")))
        frontier = nxt
    return paths.select("src", "dst", "depth", "path")


def adamic_adar(edges: DataFrame, min_shared: int = 2) -> DataFrame:
    """Adamic-Adar related-entity pairs (Adamic & Adar 2003): like
    :func:`shared_neighbor_similarity` but each shared out-neighbor z is
    weighted by its rarity, AA(a,b) = Σ_z 1/ln(in_deg(z)) — a neighbor
    everyone links to (a country, a hub org) contributes almost nothing,
    a rare shared neighbor is strong evidence. The standard KG
    link-prediction baseline next to the embedding scorers.

    ln(in_deg) is safe: a SHARED neighbor has in-degree ≥ 2 by definition,
    so the weight is ≤ 1/ln 2 and never divides by zero. Output:
    (a, b, shared, aa), aa rounded to 6 (float-sum ordering rule).

    Scale shape: identical to shared_neighbor_similarity — the wedge
    self-join keyed by the shared neighbor (hub-dst skew capped upstream
    at web scale, the stop-shingle rule), one count+sum aggregation per
    pair; the in-degree table joins on the wedge key BEFORE the pair
    aggregation, so no post-agg lookups.
    """
    e = _eager(edges.select("src", "dst").distinct())
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("din"))
    a = e.select(F.col("src").alias("a"), "dst")
    b = e.select(F.col("src").alias("b"), "dst")
    return (
        a.join(b, "dst")
        .filter(F.col("a") < F.col("b"))
        .join(indeg, "dst")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("din"))), 6).alias("aa"),
        )
        .filter(F.col("shared") >= min_shared)
    )


def weighted_shortest_paths(
    edges: DataFrame, seeds: DataFrame, max_iter: int = 8
) -> DataFrame:
    """Single-source-set weighted shortest paths ``(node, cost)`` over
    directed (src, dst, w) edges with POSITIVE INTEGER weights — the
    evidence-path cost primitive under KG retrieval (cheapest supporting
    chain from the query entities), generalizing :func:`bfs_distances`
    from hop counts to weighted costs.

    Frontier-improvement Bellman-Ford (semi-naive): each round relaxes
    only the edges out of nodes whose cost IMPROVED last round, so after
    round k the table holds the exact minimum cost over all walks of
    ≤ k edges (the textbook Bellman-Ford invariant — a node at its
    fixpoint never re-enters the frontier, and its out-edges were already
    relaxed at its final cost). An empty improvement frontier is the
    global fixpoint, so early exit is exact, and the ``max_iter`` cap
    makes the enumerated walk universe identical to the SQL oracle's
    hop-bounded WITH RECURSIVE expansion.

    Integer weights are a parity design choice, not a limitation: costs
    are exact longs in both engines, so no float-sum ordering can flip a
    min (production float costs would quantize to fixed-point the same
    way ``compose`` quantizes keep rates).

    Scale shape: the weighted edge base is checkpointed ONCE; per round
    one frontier⋈edges equi-join keyed by src + one map-side-combinable
    min per dst + one left join against the current best (improvement
    filter) — all shuffles keyed by entity id, AQE-splittable under hub
    skew; per-round eager checkpoints cut lineage and feed the isEmpty
    convergence probe.
    """
    e = _eager(edges.select("src", "dst", "w").distinct())
    best = _eager(
        seeds.select("node").distinct().withColumn("cost", F.lit(0).cast("long"))
    )
    frontier = best
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).cast("long").alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        improved = _eager(
            cand.alias("c")
            .join(best.alias("b"), "node", "left")
            .filter(F.col("b.cost").isNull() | (F.col("c.cost") < F.col("b.cost")))
            .select("node", F.col("c.cost").alias("cost"))
        )
        if improved.isEmpty():
            break
        # merge = union + min per node (improvements are strictly better, so
        # this equals the anti-join+replace form; groupBy sidesteps a
        # Catalyst constraint-rewrite bug the USING-key anti-join over two
        # checkpoint-derived frames trips in Spark 4.1)
        best = _eager(
            best.select("node", "cost")
            .union(improved.select("node", "cost"))
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        frontier = improved
    return best


def community_modularity(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Per-community modularity decomposition of the
    :func:`label_propagation` partition over the undirected entity graph:
    ``(community, n_nodes, internal_edges, degree_sum, dq)`` where
    ``dq = internal/m − (degree_sum/2m)²`` is the community's additive
    contribution to Newman-Girvan modularity Q = Σ_c dq (Newman & Girvan
    2004). The partition-quality audit a KG curation report runs on its
    community feature — extraction noise and over-merged canonicalization
    both show up as near-zero dq mass.

    Float parity: every term is a ratio of exact integer counts —
    IEEE division/multiply/subtract of identical integers is bitwise
    engine-independent — with the repo's defensive round(·, 9) on top.

    Scale shape: the deduped (src,dst) projection is checkpointed ONCE and
    feeds both label propagation and the undirected edge set; labels are
    checkpointed before fanning out to the three consumers (internal-edge
    join ×2, degree join); m is a ONE-ROW aggregate crossJoined back
    (broadcast single row — the no-collect scalar idiom); every join is an
    entity-keyed equi-join and every count map-side combinable.
    """
    ed = _eager(edges.select("src", "dst").distinct())
    lab = _eager(label_propagation(ed, iters=iters))
    und = _eager(
        ed.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    mtot = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = (
        und.select(F.col("u").alias("entity"))
        .union(und.select(F.col("v").alias("entity")))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    internal = (
        und.join(
            lab.select(F.col("entity").alias("u"), F.col("community").alias("cu")),
            "u",
        )
        .join(
            lab.select(F.col("entity").alias("v"), F.col("community").alias("cv")),
            "v",
        )
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    per_c = (
        deg.join(lab, "entity")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("degree_sum"),
        )
    )
    return (
        per_c.join(internal, "community", "left")
        .na.fill({"internal_edges": 0})
        .crossJoin(F.broadcast(mtot))
        .select(
            "community",
            "n_nodes",
            "internal_edges",
            "degree_sum",
            F.round(
                F.col("internal_edges") / F.col("m")
                - (F.col("degree_sum") / (F.lit(2.0) * F.col("m")))
                * (F.col("degree_sum") / (F.lit(2.0) * F.col("m"))),
                9,
            ).alias("dq"),
        )
    )


def entity_type_inference(
    facts: DataFrame, signatures: list[tuple[str, str, str]]
) -> DataFrame:
    """Usage-based entity typing ``(entity, etype, votes)``: every distinct
    fact casts one type vote per slot via its predicate's (subj_type,
    obj_type) signature — the inverse of :func:`schema_induction` (there:
    dictionary types audit predicates; here: predicate signatures type the
    entities, including every entity the dictionaries have never seen —
    exactly the long tail a web-scale KG is made of). The vote argmax is
    the engine-portable two-step (max votes, then min type), same as
    label_propagation's.

    Scale shape: the signature map is a model artifact folded into one
    codegen CASE per slot (no join, no UDF); one union-all projection, one
    partial-aggregated count keyed by (entity, type), one max + min-tiebreak
    — every shuffle keyed by entity id.
    """
    def case_for(slot: int) -> F.Column:
        e = F.lit(None).cast("string")
        for pred, styp, otyp in reversed(signatures):
            t = styp if slot == 0 else otyp
            e = F.when(F.col("pred") == pred, F.lit(t)).otherwise(e)
        return e

    # facts feeds two slot projections, counts feeds the max and the
    # tiebreak join — checkpoint each ONCE or the upstream extraction
    # pipeline re-executes 4x (the round-3 recompute bug class)
    f = _ckpt(facts.select("pred", "subj", "obj"))
    votes = (
        f.select(F.col("subj").alias("entity"), case_for(0).alias("etype"))
        .unionAll(
            f.select(F.col("obj").alias("entity"), case_for(1).alias("etype"))
        )
        .filter(F.col("etype").isNotNull())
    )
    counts = _ckpt(
        votes.groupBy("entity", "etype").agg(
            F.count(F.lit(1)).cast("long").alias("votes")
        )
    )
    maxv = counts.groupBy("entity").agg(F.max("votes").alias("votes"))
    return (
        counts.join(maxv, ["entity", "votes"])
        .groupBy("entity", "votes")
        .agg(F.min("etype").alias("etype"))
        .select("entity", "etype", "votes")
    )


def rule_mining(triples: DataFrame, min_support: int = 5) -> DataFrame:
    """AMIE-style chain-rule mining (Galárraga et al. 2013, WWW — *AMIE:
    association rule mining under incomplete evidence*): discover the
     2-atom property-chain rules ``body_a(s,x) ∧ body_b(x,o) ⇒
    head(s,o)`` that :func:`rule_inference` APPLIES — the inverse
    operator, and how a production KG proposes its inference rules in the
    first place. For every body pair, ``n_pairs`` distinct (s,o) path
    endpoints; for every candidate head predicate, ``support`` = how many
    of those endpoints already hold a head fact; ``confidence`` =
    support / n_pairs (CWA). On this corpus the miner rediscovers
    ``acquired ∘ acquired ⇒ acquired`` — the transitivity kg_closure
    materializes.

    Scale shape: ONE entity-keyed self-join builds all rule bodies at
    once (shuffle on the bridge entity, AQE-splittable under hub skew);
    the path table is materialized once and feeds both the body count
    and the head equi-join on (s, o); aggregations are map-side
    combinable. No per-rule driver loop — the rule space IS a DataFrame.
    """
    t = _ckpt(triples.select("subj", "pred", "obj").distinct())
    a = t.select(
        F.col("pred").alias("body_a"),
        F.col("subj").alias("s"),
        F.col("obj").alias("x"),
    )
    b = t.select(
        F.col("pred").alias("body_b"),
        F.col("subj").alias("x"),
        F.col("obj").alias("o"),
    )
    paths = _ckpt(a.join(b, "x").select("body_a", "body_b", "s", "o").distinct())
    body = paths.groupBy("body_a", "body_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    heads = t.select(
        F.col("pred").alias("head_pred"),
        F.col("subj").alias("s"),
        F.col("obj").alias("o"),
    )
    m = (
        paths.join(heads, ["s", "o"])
        .groupBy("body_a", "body_b", "head_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        m.join(body, ["body_a", "body_b"])
        .filter(F.col("support") >= min_support)
        .select(
            "body_a",
            "body_b",
            "head_pred",
            "n_pairs",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("n_pairs").cast("double"),
                6,
            ).alias("confidence"),
        )
    )


def implication_rules(triples: DataFrame, min_support: int = 2) -> DataFrame:
    """Predicate implication / inverse detection (AMIE's 1-atom rules):
    same-direction ``p(s,o) ⇒ q(s,o)`` and inverse ``p(s,o) ⇒ q(o,s)``
    candidates with support and confidence = support / |p| — the
    ontology-alignment signal (schema redundancy, symmetric predicates,
    inverse-pair discovery) mined from the KG itself. The inverse branch
    keeps ``p = q`` (that is symmetry detection); the same-direction
    branch drops the trivial reflexive case.

    One distinct fact table materialized once; both branches are fact-key
    equi-joins; sizes come from one map-side-combinable count.
    """
    t = _ckpt(triples.select("subj", "pred", "obj").distinct())
    sizes = t.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n_p"))
    q_same = t.select(
        F.col("pred").alias("q"), "subj", "obj"
    )
    same = (
        t.join(q_same, ["subj", "obj"])
        .filter(F.col("pred") != F.col("q"))
        .groupBy("pred", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .select("pred", "q", F.lit("same").alias("direction"), "support")
    )
    q_inv = t.select(
        F.col("pred").alias("q"),
        F.col("obj").alias("subj"),
        F.col("subj").alias("obj"),
    )
    inv = (
        t.join(q_inv, ["subj", "obj"])
        .groupBy("pred", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .select("pred", "q", F.lit("inverse").alias("direction"), "support")
    )
    return (
        same.union(inv)
        .join(sizes, "pred")
        .filter(F.col("support") >= min_support)
        .select(
            F.col("pred").alias("p"),
            "q",
            "direction",
            "support",
            "n_p",
            F.round(
                F.col("support").cast("double") / F.col("n_p").cast("double"), 6
            ).alias("confidence"),
        )
    )


def apply_mined_rules(
    triples: DataFrame, min_support: int = 5, min_confidence: float = 0.5
) -> DataFrame:
    """KG completion by mined rules — the third leg of the reasoning
    cycle (:func:`rule_mining` proposes, :func:`rule_inference` applies
    fixed rules, this applies the MINED ones): every chain-rule with
    confidence ≥ ``min_confidence`` fires over its own body paths, and
    path endpoints whose head fact is NOT already in the KG become
    proposed facts carrying rule provenance and confidence — exactly the
    candidate queue a human-in-the-loop KG curation system reviews.

    Scale shape: the rule table (a few rows) BROADCASTS onto the path
    table (one bridge-entity self-join, materialized once and shared with
    the mining aggregates); novelty is one left_anti fact-key join.
    """
    t = _ckpt(triples.select("subj", "pred", "obj").distinct())
    a = t.select(
        F.col("pred").alias("body_a"),
        F.col("subj").alias("s"),
        F.col("obj").alias("x"),
    )
    b = t.select(
        F.col("pred").alias("body_b"),
        F.col("subj").alias("x"),
        F.col("obj").alias("o"),
    )
    paths = _ckpt(
        a.join(b, "x").select("body_a", "body_b", "s", "o").distinct()
    )
    body = paths.groupBy("body_a", "body_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    heads = t.select(
        F.col("pred").alias("head_pred"),
        F.col("subj").alias("s"),
        F.col("obj").alias("o"),
    )
    m = (
        paths.join(heads, ["s", "o"])
        .groupBy("body_a", "body_b", "head_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    rules = (
        m.join(body, ["body_a", "body_b"])
        .filter(F.col("support") >= min_support)
        .select(
            "body_a",
            "body_b",
            "head_pred",
            F.round(
                F.col("support").cast("double")
                / F.col("n_pairs").cast("double"),
                6,
            ).alias("confidence"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )
    fired = paths.join(F.broadcast(rules), ["body_a", "body_b"])
    known = t.select(
        F.col("pred").alias("head_pred"),
        F.col("subj").alias("s"),
        F.col("obj").alias("o"),
    )
    novel = fired.join(known, ["head_pred", "s", "o"], "left_anti")
    return novel.select(
        F.col("s").alias("subj"),
        F.col("head_pred").alias("pred"),
        F.col("o").alias("obj"),
        "body_a",
        "body_b",
        "confidence",
    ).distinct()
