"""Planted-case tests for incremental (cross-dump) dedup: a new batch
classified against a seen corpus as exact_dup / near_dup / new."""

from pyspark.sql import Row

from modern_search_engines_spark.operators import crossdedup

BASE = ("the castle and the museum of the old town in the river valley "
        "is a place to see and to visit in every season of the year")
OTHER = ("a completely different story about the sea and the ships in "
         "the calm water of the wide open bay far away from any town")


def _seen(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=BASE),          # same text, higher id
        Row(doc_id=3, text=OTHER),
    ])


def _new(spark):
    return spark.createDataFrame([
        Row(doc_id=10, text=BASE),                      # exact dup of 1
        Row(doc_id=11, text=BASE + " with a new tower"),  # near dup
        Row(doc_id=12, text="an entirely unrelated essay on mountains "
                            "and snow and the high passes of the north "
                            "that shares no phrasing with the others"),
    ])


def test_statuses_and_dup_of(spark):
    got = {r["doc_id"]: r.asDict() for r in crossdedup.dedup_against(
        _new(spark), _seen(spark), jaccard_threshold=0.3).collect()}
    assert got[10]["status"] == "exact_dup"
    assert got[10]["dup_of"] == 1            # min seen id, not 2
    assert got[10]["jaccard"] is None
    assert got[11]["status"] == "near_dup"
    assert got[11]["dup_of"] == 1
    assert 0.3 <= got[11]["jaccard"] <= 1.0
    assert got[12]["status"] == "new" and got[12]["dup_of"] is None


def test_exact_only_mode(spark):
    got = {r["doc_id"]: r["status"] for r in crossdedup.dedup_against(
        _new(spark), _seen(spark)).collect()}   # no jaccard threshold
    assert got == {10: "exact_dup", 11: "new", 12: "new"}


def test_precomputed_seen_index_matches(spark):
    seen, new = _seen(spark), _new(spark)
    md5, sig, sh = crossdedup.seen_index(seen)
    a = sorted(map(tuple, crossdedup.dedup_against(
        new, seen, jaccard_threshold=0.3).collect()))
    b = sorted(map(tuple, crossdedup.dedup_against(
        new, jaccard_threshold=0.3, seen_md5=md5, seen_sig=sig,
        seen_sh=sh).collect()))
    assert a == b


def test_best_match_tie_breaks_to_min_seen_id(spark):
    # two identical seen docs (4 and 5) both near-match the new doc —
    # dup_of must name the smaller id
    seen = spark.createDataFrame([
        Row(doc_id=5, text=BASE), Row(doc_id=4, text=BASE)])
    new = spark.createDataFrame([Row(doc_id=20, text=BASE + " extra")])
    got = crossdedup.dedup_against(new, seen,
                                   jaccard_threshold=0.3).collect()[0]
    assert got["status"] == "near_dup" and got["dup_of"] == 4


def test_dump_never_joins_itself(spark):
    # two near-identical docs WITHIN the new dump stay 'new' when the
    # seen corpus is unrelated — cross-dump dedup is new×seen only
    seen = spark.createDataFrame([Row(doc_id=1, text=OTHER)])
    new = spark.createDataFrame([
        Row(doc_id=10, text=BASE), Row(doc_id=11, text=BASE)])
    got = {r["doc_id"]: r["status"] for r in crossdedup.dedup_against(
        new, seen, jaccard_threshold=0.2).collect()}
    assert got == {10: "new", 11: "new"}


def test_hot_band_guard_raises(spark):
    import pytest
    seen = spark.createDataFrame(
        [Row(doc_id=i, text=BASE) for i in range(1, 8)])
    new = spark.createDataFrame([Row(doc_id=100, text=BASE + " tower")])
    with pytest.raises(ValueError, match="max_band_docs"):
        crossdedup.dedup_against(new, seen, jaccard_threshold=0.3,
                                 max_band_docs=3)
    got = crossdedup.dedup_against(new, seen, jaccard_threshold=0.3,
                                   max_band_docs=100).collect()[0]
    assert got["status"] == "near_dup" and got["dup_of"] == 1


def test_dedup_dump_job_cli(spark, tmp_path):
    """End-to-end spark-submit job: classify a dump, then rerun and
    assert the seen-index stages RESUME (same commit ids — the corpus
    is not rescanned)."""
    import json
    import os
    import subprocess
    import sys

    seen_p, new_p = str(tmp_path / "seen"), str(tmp_path / "new")
    _seen(spark).write.parquet(seen_p)
    _new(spark).write.parquet(new_p)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4", "PYTHONPATH": repo}

    def run(out):
        proc = subprocess.run(
            [sys.executable, "jobs/dedup_dump.py", "--seen", seen_p,
             "--new", new_p, "--index", str(tmp_path / "idx"),
             "--out", out, "--jaccard-threshold", "0.3"],
            capture_output=True, text=True, timeout=300, cwd=repo, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads([l for l in proc.stdout.splitlines()
                           if l.startswith("{")][-1])

    r1 = run(str(tmp_path / "out1"))
    assert r1["summary"] == {"exact_dup": 1, "near_dup": 1, "new": 1}
    assert {m["name"] for m in r1["index_stages"]} == {
        "seen_md5", "seen_shingles", "seen_sig"}
    # Bloom prefilter is ON by default: no false negatives (the exact
    # dup must reach the join) and the probe side actually shrinks
    b = r1["bloom"]
    assert b["probe_rows_in"] == 3
    assert 1 <= b["probe_rows_out"] < b["probe_rows_in"]
    r2 = run(str(tmp_path / "out2"))
    assert r2["summary"] == r1["summary"]
    c1 = {m["name"]: m["commit_id"] for m in r1["index_stages"]}
    c2 = {m["name"]: m["commit_id"] for m in r2["index_stages"]}
    assert c1 == c2          # resumed, not rebuilt


def test_dedup_dump_job_no_bloom_identical(spark, tmp_path):
    """--no-bloom must change cost only, never the classification."""
    import json
    import os
    import subprocess
    import sys

    seen_p, new_p = str(tmp_path / "seen"), str(tmp_path / "new")
    _seen(spark).write.parquet(seen_p)
    _new(spark).write.parquet(new_p)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4", "PYTHONPATH": repo}
    proc = subprocess.run(
        [sys.executable, "jobs/dedup_dump.py", "--seen", seen_p,
         "--new", new_p, "--index", str(tmp_path / "idx"),
         "--out", str(tmp_path / "out"), "--no-bloom"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads([l for l in proc.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert out["bloom"] is None
    assert out["summary"] == {"exact_dup": 1, "new": 2}  # exact-only run
