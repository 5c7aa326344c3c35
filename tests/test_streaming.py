"""Structured Streaming ingestion: incremental crawl -> exactly-once triples."""

import glob

from pyspark.sql import functions as F

from autoextraction_spark import corpus
from autoextraction_spark.streaming import ingest


def test_incremental_ingest_matches_batch(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    pages = corpus.web_pages(spark, sf_dir).cache()
    # land the corpus in two separate file drops
    pages.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(in_dir)
    q = ingest.stream_kg_pipeline(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)

    pages.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)
    q2 = ingest.stream_kg_pipeline(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    all_rows = spark.read.parquet(out_dir).select("url", "pred", "subj", "obj")
    # exactly-once: the epoch-partition-overwrite sink must leave ZERO
    # duplicate triples (no .distinct() crutch — each page lands in exactly
    # one epoch and to_triples dedups within a batch)
    assert all_rows.count() == all_rows.distinct().count()
    got = all_rows.distinct()
    gold = corpus.gold_triples(spark, sf_dir)
    assert got.exceptAll(gold).isEmpty()
    assert gold.exceptAll(got).isEmpty()
    # second drop processed only the NEW files (streaming checkpoint):
    # epochs from the first run must not be re-emitted
    epochs = spark.read.parquet(out_dir).select("_epoch").distinct().count()
    assert epochs >= 2
    assert glob.glob(f"{ckpt}/offsets/*")


def test_stateful_dedup_across_batches(spark, sf_dir, tmp_path):
    # duplicates landed in a LATER micro-batch must be dropped by the
    # cross-batch digest state (applyInPandasWithState)
    in_dir = str(tmp_path / "landing3")
    out_dir = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt3")
    pages = corpus.web_pages(spark, sf_dir, with_text=True).filter(
        F.col("doc_id") < 40
    ).cache()
    # drop 1: docs 0-19; drop 2: docs 10-39 (10-19 are exact re-crawls)
    pages.filter(F.col("doc_id") < 20).write.mode("append").parquet(in_dir)

    def drain():
        # a digest emits AT MOST ONCE over the query lifetime (the state
        # bit), so a plain parquet append is exactly-once per digest
        q = (
            ingest.stateful_exact_dedup(ingest.stream_pages(spark, in_dir))
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    assert spark.read.parquet(out_dir).count() == 20
    pages.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 40)).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    urls = [r.url for r in spark.read.parquet(out_dir).collect()]
    # 40 distinct docs total; the 10 re-crawled pages appear exactly once
    assert len(urls) == len(set(urls)) == 40


def test_windowed_counts_stream(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "landing2")
    corpus.web_pages(spark, sf_dir).write.mode("append").parquet(in_dir)
    stream = ingest.stream_pages(spark, in_dir)
    agg = ingest.windowed_page_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("page_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("SELECT sum(n_pages) AS total FROM page_counts").collect()[0]
    assert out.total == 500
