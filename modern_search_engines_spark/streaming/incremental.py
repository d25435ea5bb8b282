"""Incremental index maintenance via Structured Streaming.

The reference has no streaming (its crawler loop is incremental batch,
Crawler.py:256-333, SURVEY.md §2.9) — this module is the Spark-native
extension: newly landed page files are picked up by a file-source stream,
run through the SAME extraction stage, and appended as extracted rows +
per-batch tf deltas. A periodic compaction job merges tf deltas into the
main index tables (the posting-merge stage is already
re-runnable/resumable, plans/build.py).

``trigger(availableNow=True)`` gives the incremental-batch semantics of
the reference's crawl loop: process everything new, checkpoint, stop.
At cluster scale the file source becomes an Iceberg incremental-snapshot
read; the dataflow is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from ..operators import indexing

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def start_incremental_extract(spark: SparkSession, pages_dir: str,
                              out_dir: str, checkpoint_dir: str,
                              ngram_max: int = 3):
    """File-source stream → extraction UDFs → parquet append.

    Returns the started StreamingQuery (availableNow: drains the backlog,
    checkpoints, then finishes — the reference's crawl-loop semantics).
    """
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 16)
              .parquet(pages_dir)
              .drop("text", "lang"))
    extracted = indexing.extract_pages(stream, ngram_max)
    return (extracted.writeStream
            .format("parquet")
            .option("path", os.path.join(out_dir, "extracted_stream"))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def start_incremental_tf(spark: SparkSession, pages_dir: str,
                         out_dir: str, checkpoint_dir: str,
                         ngram_max: int = 3):
    """Streaming tf deltas via foreachBatch: each micro-batch computes its
    own (doc_id, term, tf) partial and appends it as a delta partition —
    the map-side half of the two-phase aggregation; compaction merges
    deltas with ``groupBy(doc_id, term).sum`` (idempotent by batch_id)."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .parquet(pages_dir)
              .drop("text", "lang"))
    extracted = indexing.extract_pages(stream, ngram_max)
    indexed = indexing.filter_index_docs(extracted)

    delta_dir = os.path.join(out_dir, "tf_delta")

    def sink(batch_df, batch_id: int) -> None:
        tf = indexing.build_tf(batch_df)
        (tf.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(os.path.join(delta_dir, f"batch={batch_id}")))

    return (indexed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_tf_deltas(spark: SparkSession, out_dir: str):
    """Merge all tf deltas into a consolidated tf table.

    The full compaction cycle at posting level: refresh the corpus
    scalars (N, avgdl, idf — cheap aggregates), rebuild the delta docs'
    bm25 partials against them, compress the delta with
    ``postings.build_compressed_postings`` and fold it into the serving
    table with ``postings.merge_compressed_postings`` (byte-identical
    to a from-scratch build over the union, so repeated cycles never
    drift); tombstones go through
    ``postings.delete_docs_from_postings``."""
    delta_dir = os.path.join(out_dir, "tf_delta")
    deltas = spark.read.option("basePath", delta_dir).parquet(
        os.path.join(delta_dir, "batch=*"))
    return (deltas.groupBy("doc_id", "term")
            .agg(F.sum("tf").alias("tf")))
