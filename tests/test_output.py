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
