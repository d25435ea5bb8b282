"""Watermarked windowed aggregation: streaming output must equal the
batch aggregation for every window the watermark has closed."""

import os

from pyspark.sql import functions as F

from modern_search_engines_spark.streaming import windowed


def test_windowed_stream_matches_batch(spark, sf_dirs, tmp_path):
    # the file stream source needs a directory of files
    src = str(tmp_path / "events_in")
    (spark.read.parquet(f"{sf_dirs['t1']}/events.parquet")
     .repartition(4).write.mode("overwrite").parquet(src))
    events = spark.read.parquet(src)

    out = str(tmp_path / "win_out")
    q = windowed.start_windowed_stats(
        spark, src, out, str(tmp_path / "cp"))
    q.awaitTermination(180)

    batch = windowed.windowed_event_stats(events)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = batch.where(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    } if os.listdir(out) else {}
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in closed.collect()
    }
    # every watermark-closed window must be present and exact
    for k, v in want.items():
        assert got.get(k) == v, k
    # nothing in the stream output may contradict the batch result
    all_batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert all_batch[k] == v, k
