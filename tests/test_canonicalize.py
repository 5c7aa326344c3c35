"""Connected components (stage F) on hand-built graphs."""

from autoextraction_spark.operators.canonicalize import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chain_converges_to_min(spark):
    # d-c-b-a chain: min-label must propagate the full diameter
    got = _cc(spark, [("d", "c"), ("c", "b"), ("b", "a")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_two_components(spark):
    got = _cc(spark, [("b", "a"), ("y", "z")])
    assert got == {"a": "a", "b": "a", "y": "y", "z": "y"}


def test_cycle_and_self_loop(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("q", "q")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["q"] == "q"
