"""Streaming exact dedup (dropDuplicatesWithinWatermark): within-horizon
duplicates dropped exactly; state evicted past the watermark (bounded
state — a late replay re-emits, by design); checkpoint-restart safe."""

import datetime as dt

from pyspark.sql import functions as F

from modern_search_engines_spark.streaming import dedup as sdedup


def _rows(spec):
    """spec: list of (doc_id, hour_offset, text)."""
    base = dt.datetime(2024, 1, 1)
    return [(i, base + dt.timedelta(hours=h), f"u{i}.example", t)
            for i, h, t in spec]


def _write(spark, rows, path):
    spark.createDataFrame(rows, sdedup.DOCS_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)


def test_within_horizon_duplicates_dropped_exactly(spark, tmp_path):
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    rows = _rows([
        (0, 0.0, "alpha text"),
        (1, 0.2, "alpha text"),      # dup of 0, inside horizon
        (2, 0.4, "beta text"),
        (3, 0.5, "gamma text"),
        (4, 0.6, "beta text"),       # dup of 2
        (5, 1.0, "delta text"),
    ])
    _write(spark, rows, src)
    q = sdedup.start_dedup_stream(spark, src, out, cp)
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    texts = sorted(r["text"] for r in got)
    assert texts == sorted(
        ["alpha text", "beta text", "gamma text", "delta text"])
    # every emitted row is one of the input rows
    inp = {(r[0], r[3]) for r in rows}
    assert all((r["doc_id"], r["text"]) in inp for r in got)


def test_state_evicts_past_watermark_and_survives_restart(spark, tmp_path):
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    # run 1: k1 at h0, k3 at h4.5, pusher at h5 → watermark ≈ h3:
    # k1's entry (h0 + 2h horizon < h3) is evicted, k3's survives
    _write(spark, _rows([
        (0, 0.0, "k1 early"),
        (1, 4.5, "k3 fresh"),
        (2, 5.0, "watermark pusher"),
    ]), src)
    q = sdedup.start_dedup_stream(spark, src, out, cp)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3

    # run 2 (same checkpoint): a replay of k1 re-emits (bounded-state
    # contract: its key aged out), a replay of k3 is still dropped
    _write(spark, _rows([
        (3, 5.5, "k1 early"),
        (4, 5.5, "k3 fresh"),
    ]), src)
    q = sdedup.start_dedup_stream(spark, src, out, cp)
    q.awaitTermination(120)
    got = sorted((r["doc_id"], r["text"])
                 for r in spark.read.parquet(out).collect())
    assert (3, "k1 early") in got          # re-emitted after eviction
    assert (4, "k3 fresh") not in got      # still deduped in-state
    assert len(got) == 4


def test_static_twin_keeps_first_arrival(spark):
    rows = _rows([(0, 1.0, "a"), (1, 0.5, "a"), (2, 0.7, "b")])
    d = spark.createDataFrame(rows, sdedup.DOCS_SCHEMA)
    got = sorted(r["doc_id"]
                 for r in sdedup.dedup_docs_stream(d).collect())
    assert got == [1, 2]  # doc 1 is the earlier "a"
