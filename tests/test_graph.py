"""Entity PageRank / degree stats over the KG edge graph (graph.py)."""

import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import graph


def _reference_pagerank(edges, d=0.85, iters=3):
    """Plain-python fixed-iteration damped PageRank with uniform dangling
    redistribution — the formula under test, independently implemented."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {n: 0 for n in nodes}
    for u, _ in edges:
        out[u] += 1
    n = float(len(nodes))
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if out[v] == 0)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / out[u]
        rank = {
            v: (1.0 - d) / n + d * (contrib[v] + dang / n) for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def diamond(spark):
    # a -> b, a -> c, b -> d, c -> d; d dangling
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    return edges, df


def test_pagerank_matches_reference_formula(diamond):
    edges, df = diamond
    got = {r.entity: r for r in graph.entity_pagerank(df).collect()}
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for v, expect in want.items():
        assert got[v].pagerank == pytest.approx(expect, abs=1e-6), v
    assert (got["a"].out_deg, got["a"].in_deg) == (2, 0)
    assert (got["d"].out_deg, got["d"].in_deg) == (0, 2)
    # total mass conserved (dangling redistributed, not dropped)
    assert sum(r.pagerank for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_sink_accumulates(diamond):
    _, df = diamond
    ranks = {r.entity: r.pagerank for r in graph.entity_pagerank(df).collect()}
    assert ranks["d"] > ranks["b"] == ranks["c"] > 0


def test_triple_edges_distinct(spark):
    triples = spark.createDataFrame(
        [("u1", "p", "s", "o"), ("u2", "q", "s", "o"), ("u3", "p", "s", "o2")],
        "url string, pred string, subj string, obj string",
    )
    got = {
        (r.src, r.dst) for r in graph.triple_edges(triples).collect()
    }
    assert got == {("s", "o"), ("s", "o2")}
