"""ljqpy.py utility-operator parity (S10-S12)."""

from pyspark.sql import functions as F

from autoextraction_spark.operators import fileops


def test_merge_and_dedup(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "id int, v string")
    merged = fileops.merge_files([a, b])
    assert merged.count() == 4
    assert fileops.remove_dup_rows(merged).count() == 3


def test_zip_join(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "ia int, va string")
    b = spark.createDataFrame([(10, "x"), (20, "y")], "ib int, vb string")
    z = fileops.zip_join(a, b, "ia", "ib").orderBy("ia").collect()
    assert [(r.va, r.vb) for r in z] == [("a", "x"), ("b", "y")]


def test_set_product(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(10,), (20,), (30,)], "y int")
    assert fileops.set_product(a, b).count() == 6


def test_sample_rows_deterministic(spark):
    df = spark.range(100)
    s1 = sorted(r.id for r in fileops.sample_rows(df, 10, seed=7).collect())
    s2 = sorted(r.id for r in fileops.sample_rows(df, 10, seed=7).collect())
    assert s1 == s2 and len(s1) == 10


def test_random_half_split_disjoint(spark):
    df = spark.range(1000)
    a, b = fileops.random_half_split(df, seed=42)
    assert a.count() + b.count() == 1000
    assert a.join(b, "id", "inner").count() == 0


def test_run_sql(spark):
    spark.range(5).createOrReplaceTempView("t_fileops")
    got = fileops.run_sql(spark, "SELECT count(*) AS n FROM t_fileops").collect()[0].n
    assert got == 5


def test_load_json_array(spark, tmp_path):
    # S2 whole-file JSON array (dataset/webnlg.py:139-150)
    p = tmp_path / "arr.json"
    p.write_text('[{"text": "a", "n": 1}, {"text": "b", "n": 2}]')
    from autoextraction_spark.operators.fileops import load_json_array
    got = {(r.text, r.n) for r in load_json_array(spark, str(p)).collect()}
    assert got == {("a", 1), ("b", 2)}


def test_zip_join_rank_stays_jvm_side(spark):
    # the rank must not round-trip rows through Python (no RDD scan in the
    # plan) and must be a dense 0..n-1 sequence under any partition layout
    a = spark.range(0, 97).select((F.col("id") * 3 % 97).alias("k")).repartition(7)
    ranked = fileops._with_rank(a, "k")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # the eager localCheckpoint (recompute guard) legitimately scans a JVM
    # ExistingRDD of InternalRows; what must NOT appear is any Python
    # round-trip — no python UDF stage in the plan, no PythonRDD (pickled
    # rows) anywhere in the materialized lineage
    assert "EvalPython" not in plan
    lineage = ranked._jdf.rdd().toDebugString().decode(
        errors="replace"
    ) if isinstance(ranked._jdf.rdd().toDebugString(), bytes) else str(
        ranked._jdf.rdd().toDebugString()
    )
    assert "PythonRDD" not in lineage
    rows = ranked.orderBy("_rn").collect()
    assert [r._rn for r in rows] == list(range(97))
    assert [r.k for r in rows] == sorted(r.k for r in rows)
