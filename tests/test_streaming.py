"""Structured-Streaming incremental index maintenance (SURVEY.md §2.9
extension): file-source stream → extraction → extracted rows + tf deltas;
delta compaction equals the batch tf."""

import os

from pyspark.sql import functions as F

from modern_search_engines_spark import corpus
from modern_search_engines_spark.operators import indexing
from modern_search_engines_spark.streaming import incremental

N, SEED = 20, 6


def _land_pages(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    (corpus.pages_df(spark, N, seed=SEED, num_partitions=2)
     .write.mode("overwrite").parquet(pages_dir))
    return pages_dir


def test_incremental_extract(spark, tmp_path):
    pages_dir = _land_pages(spark, tmp_path)
    out = str(tmp_path / "out")
    q = incremental.start_incremental_extract(
        spark, pages_dir, out, str(tmp_path / "cp1"))
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(out, "extracted_stream"))
    assert got.count() == N
    batch = indexing.extract_pages(
        spark.read.parquet(pages_dir).drop("text", "lang"))
    a = {r["url"]: r["text"] for r in got.select("url", "text").collect()}
    b = {r["url"]: r["text"] for r in batch.select("url", "text").collect()}
    assert a == b


def test_incremental_tf_compaction_matches_batch(spark, tmp_path):
    pages_dir = _land_pages(spark, tmp_path)
    out = str(tmp_path / "out2")
    q = incremental.start_incremental_tf(
        spark, pages_dir, out, str(tmp_path / "cp2"))
    q.awaitTermination(120)
    compacted = incremental.compact_tf_deltas(spark, out)
    batch_tf = indexing.build_tf(indexing.filter_index_docs(
        indexing.extract_pages(
            spark.read.parquet(pages_dir).drop("text", "lang"))))
    a = {(r["doc_id"], r["term"]): r["tf"] for r in compacted.collect()}
    b = {(r["doc_id"], r["term"]): r["tf"] for r in batch_tf.collect()}
    assert a == b
