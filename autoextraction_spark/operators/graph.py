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


def triple_edges(
    triples: DataFrame, src_col: str = "subj", dst_col: str = "obj"
) -> DataFrame:
    """Distinct (src, dst) entity edges from a triple table."""
    return triples.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()


def entity_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """(entity, out_deg, in_deg, pagerank) over a distinct (src, dst) edge
    list.

    Standard damped PageRank with uniform dangling-mass redistribution:

        r_{k+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_k(u)/out_deg(u)
                                     + Σ_{u: out_deg(u)=0} r_k(u) / N )

    ``r_0 = 1/N``; ``pagerank`` is rounded to 6 decimals so the SQL oracle's
    (order-insensitive) float sums compare exactly.
    """
    ck = _ckpt if materialize else (lambda df: df)
    edges = ck(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    base = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left")
        .join(indeg, nodes.node == indeg.dst, "left")
        .select(
            "node",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
        )
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
                "in_deg",
                "n",
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
