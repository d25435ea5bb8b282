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
