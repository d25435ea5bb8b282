"""Streaming exact dedup — drop re-crawled/replayed documents as they
arrive (Structured Streaming).

The batch operators answer "what is duplicated in this table"
(``operators/dedup.exact_dups``) and "what did earlier dumps already
contain" (``operators/crossdedup``); this closes the third operational
shape: a CONTINUOUS ingest (crawler output, Kafka replay, at-least-once
delivery) where duplicates must be dropped inside the stream itself.

Built on ``dropDuplicatesWithinWatermark`` (Spark 3.5+): state keeps one
entry per key seen within the watermark horizon and EVICTS it when the
watermark passes — so state is O(keys in the horizon), not O(all-time
keys), the same bounded-state stance as ``sessions.py``'s event-time
timeout. The key is ``md5(text)`` (32 bytes/doc in the state store,
never the document), computed map-side before the stateful exchange.

Semantics vs plain ``dropDuplicates``: within-horizon duplicates are
dropped EXACTLY; a duplicate arriving after the watermark evicted its
key is re-emitted (the unbounded-state alternative is exactly what a
10^12-doc stream cannot hold). Downstream, the periodic batch
``crossdedup.dedup_against`` run against the persisted seen-index mops
up cross-horizon stragglers — the standard two-tier design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_SCHEMA = ("doc_id long, ts timestamp, url string, text string")


def dedup_docs_stream(docs: DataFrame, text_col: str = "text",
                      ts_col: str = "ts", id_col: str = "doc_id",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming frame → same frame minus within-horizon duplicate
    texts (first arrival wins; key = md5(text)). ``id_col`` is only the
    deterministic tiebreak of the static twin (streaming keeps
    whichever physical row arrives first)."""
    keyed = docs.withColumn("__k", F.md5(F.col(text_col).cast("binary")))
    if docs.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["__k"]).drop("__k")
    # static twin for tests/backfills: first arrival by (ts, id)
    from pyspark.sql import Window
    w = Window.partitionBy("__k").orderBy(ts_col, id_col)
    return (keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn", "__k"))


def start_dedup_stream(spark: SparkSession, docs_dir: str, out_dir: str,
                       checkpoint_dir: str, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "2 hours"):
    """File-source stream → watermarked dedup → parquet (append),
    ``availableNow`` incremental-batch semantics (drain, checkpoint,
    stop) — restart-safe exactly-once output via the checkpoint."""
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(docs_dir))
    deduped = dedup_docs_stream(stream, text_col, ts_col,
                                watermark=watermark)
    return (deduped.writeStream
            .format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
