"""Custom stateful streaming operator (applyInPandasWithState
sessionization): after draining the backlog with availableNow, the last
update per user must equal the batch lag-window sessionization
(contract.q_events_sessions) exactly."""

from pyspark.sql import Window, functions as F

from modern_search_engines_spark import contract
from modern_search_engines_spark.streaming import sessions, windowed


def test_stateful_sessionization_matches_batch(spark, sf_dirs, tmp_path):
    src = str(tmp_path / "events_in")
    (spark.read.parquet(f"{sf_dirs['t1']}/events.parquet")
     .coalesce(1).write.mode("overwrite").parquet(src))

    stream = (spark.readStream.schema(windowed.EVENTS_SCHEMA)
              .parquet(src))
    out = sessions.sessionize_stream(stream)
    q = (out.writeStream.format("memory").queryName("sess_updates")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    # last update per user = the final running totals
    updates = spark.table("sess_updates")
    w = Window.partitionBy("user_id").orderBy(
        F.monotonically_increasing_id().desc())
    final = (updates.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1))
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in final.collect()}

    batch = contract.q_events_sessions(spark, sf_dirs["t1"])
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in batch.collect()}
    assert got == want


def test_sessionization_exact_across_out_of_order_microbatches(
        spark, tmp_path):
    """One user's events split OUT OF ORDER across 3 micro-batches
    (middle first, then the head arriving 'late' within the watermark,
    then the tail) must still produce exactly the batch lag-window
    totals — the in-state buffer + watermark finalization at work."""
    import glob
    import os
    import shutil

    base = 1_700_000_000  # any fixed epoch anchor
    mins = lambda m: base + m * 60  # noqa: E731

    def ev(eid, user, m):
        return (eid, user, mins(m))

    # user 100: minutes 0,10 | 80,90 | 200,210 → 3 sessions, 6 events
    batches = [
        [ev(3, 100, 80), ev(4, 100, 90), ev(10, 200, 5)],   # middle first
        [ev(1, 100, 0), ev(2, 100, 10), ev(5, 100, 200)],   # head late
        [ev(6, 100, 210), ev(11, 200, 300)],                # tail
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(eid, u, t) for eid, u, t in rows],
            "event_id long, user_id long, epoch long"
        ).select("event_id", "user_id",
                 F.col("epoch").cast("timestamp").alias("ts"))
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = str(src / f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = sessions.sessionize_stream(stream, watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("sess_ooo")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cp_ooo"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # it really ran as ≥3 micro-batches

    updates = spark.table("sess_ooo")
    w = Window.partitionBy("user_id").orderBy(
        F.monotonically_increasing_id().desc())
    final = (updates.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1))
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in final.collect()}
    assert got == {100: (3, 6), 200: (2, 2)}


def test_idle_user_state_retires_after_horizon(spark, tmp_path):
    """With retire_after_min set, a user idle past the horizon (in
    event time) must be finalized and DROPPED from the state store —
    state is O(active users), not O(all-time users) — while totals
    stay exact for everyone."""
    import glob
    import os
    import shutil

    base = 1_700_000_000
    mins = lambda m: base + m * 60  # noqa: E731
    # user 1: two events early, then never again. user 2: keeps going,
    # with late timestamps that push the watermark far past user 1's
    # last activity + horizon.
    batches = [
        [(1, 1, mins(0)), (2, 1, mins(10)), (3, 2, mins(5))],
        [(4, 2, mins(24 * 60))],          # wm jumps ~1 day
        [(5, 2, mins(2 * 24 * 60))],      # another day — u1 times out
        [(6, 2, mins(3 * 24 * 60))],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, epoch long"
        ).select("event_id", "user_id",
                 F.col("epoch").cast("timestamp").alias("ts"))
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = str(src / f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = sessions.sessionize_stream(stream, watermark="1 hour",
                                     retire_after_min=120)
    q = (out.writeStream.format("memory").queryName("sess_retire")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cp_retire"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    state_rows = [p["stateOperators"][0]["numRowsTotal"]
                  for p in q.recentProgress if p["stateOperators"]]
    assert max(state_rows) >= 2          # both users were in state
    assert state_rows[-1] == 1, state_rows  # idle user 1 evicted

    updates = spark.table("sess_retire")
    w = Window.partitionBy("user_id").orderBy(
        F.monotonically_increasing_id().desc())
    final = (updates.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1))
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in final.collect()}
    # totals exact despite the eviction (the timeout emits final totals)
    assert got == {1: (1, 2), 2: (4, 4)}
