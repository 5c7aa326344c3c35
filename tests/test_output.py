"""Output/serialization operators (output.py): N-Triples export."""


def test_to_ntriples_escaping(spark):
    from autoextraction_spark.operators.output import to_ntriples

    df = spark.createDataFrame(
        [("Ada Lovelace", "born_in", 'Lon"don\\x'), ("B%b", "works<at", "plain")],
        "subj string, pred string, obj string",
    )
    got = {r.subj: r.ntriple for r in to_ntriples(df).collect()}
    assert got["Ada Lovelace"] == (
        '<http://kg.example/Ada%20Lovelace> <http://kg.example/born_in> '
        '"Lon\\"don\\\\x" .'
    )
    assert got["B%b"] == (
        '<http://kg.example/B%25b> <http://kg.example/works%3Cat> "plain" .'
    )


def test_fact_history_scd2_segments(spark):
    from autoextraction_spark.operators.output import fact_history

    # recency key rk(doc) = (doc%365)*86400 + (doc*7)%86400 is strictly
    # increasing on small doc ids, so pages 1..4 assert in that order:
    # X: v1, v1, v2, v1  -> three segments (the A->A run collapses);
    # page 2 also asserts a SAME-INSTANT conflict for Y (max-obj rule)
    rows = [
        ("X", "born_in", "v1", "https://a/page/1"),
        ("X", "born_in", "v1", "https://a/page/2"),
        ("X", "born_in", "v2", "https://a/page/3"),
        ("X", "born_in", "v1", "https://a/page/4"),
        ("Y", "born_in", "b", "https://a/page/2"),
        ("Y", "born_in", "a", "https://a/page/2"),
        ("Y", "other_pred", "z", "https://a/page/1"),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "url"])
    got = fact_history(df, preds=["born_in"]).collect()
    X = sorted(
        [(r.version, r.obj, r.is_current) for r in got if r.subj == "X"]
    )
    assert X == [(1, "v1", False), (2, "v2", False), (3, "v1", True)]
    # open segment marked -1; closed segments end where the next begins
    xs = sorted([r for r in got if r.subj == "X"], key=lambda r: r.version)
    assert xs[0].valid_to_excl == xs[1].valid_from
    assert xs[2].valid_to_excl == -1
    # same-instant conflict: one current row, max obj wins
    Y = [(r.version, r.obj, r.is_current) for r in got if r.subj == "Y"]
    assert Y == [(1, "b", True)]
    # predicate filter applied
    assert all(r.pred == "born_in" for r in got)
