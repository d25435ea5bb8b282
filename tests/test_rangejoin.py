"""Planted-case tests for the bucketized range join: containment
semantics, overlap multiplicity, keys, left join, bin-count guard, and
a brute-force equivalence property."""

import pytest

from modern_search_engines_spark.operators.rangejoin import range_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, ["pid", "p"])


def _ivs(spark, rows):
    return spark.createDataFrame(rows, ["iid", "lo", "hi"])


def test_containment_and_overlap(spark):
    pts = _pts(spark, [(1, 5.0), (2, 10.0), (3, 25.0), (4, -3.0)])
    ivs = _ivs(spark, [(100, 0.0, 10.0), (101, 10.0, 20.0),
                       (102, 8.0, 12.0), (103, 30.0, 40.0)])
    got = sorted((r["pid"], r["iid"]) for r in
                 range_join(pts, ivs, "p", "lo", "hi", 10.0).collect())
    # 5→100; 10→100 (inclusive hi), 101 (inclusive lo), 102; 25→none;
    # -3→none (negative bins must not false-match)
    assert got == [(1, 100), (2, 100), (2, 101), (2, 102)]


def test_keys_partition_matches(spark):
    pts = spark.createDataFrame([(1, "u1", 5.0), (2, "u2", 5.0)],
                                ["pid", "user", "p"])
    ivs = spark.createDataFrame([("u1", 0.0, 10.0)],
                                ["user", "lo", "hi"])
    got = [(r["pid"]) for r in range_join(
        pts, ivs, "p", "lo", "hi", 10.0, keys=("user",)).collect()]
    assert got == [1]


def test_left_join_keeps_unmatched(spark):
    pts = _pts(spark, [(1, 5.0), (2, 99.0)])
    ivs = _ivs(spark, [(100, 0.0, 10.0)])
    got = {r["pid"]: r["iid"] for r in range_join(
        pts, ivs, "p", "lo", "hi", 10.0, how="left").collect()}
    assert got == {1: 100, 2: None}


def test_bin_guard_and_invalid_intervals(spark):
    pts = _pts(spark, [(1, 5.0)])
    ivs = _ivs(spark, [(100, 0.0, 1000.0), (101, 9.0, 2.0)])
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        range_join(pts, ivs, "p", "lo", "hi", 10.0,
                   max_bins_per_interval=50)
    # hi < lo is an empty interval, silently dropped (not a crash)
    got = range_join(pts, _ivs(spark, [(101, 9.0, 2.0)]),
                     "p", "lo", "hi", 10.0).collect()
    assert got == []


def test_matches_bruteforce_theta_join(spark):
    import pyspark.sql.functions as F
    pts = _pts(spark, [(i, float((i * 37) % 100)) for i in range(80)])
    ivs = _ivs(spark, [(i, float((i * 11) % 90),
                        float((i * 11) % 90 + (i % 13))) for i in range(30)])
    fast = sorted((r["pid"], r["iid"]) for r in range_join(
        pts, ivs, "p", "lo", "hi", 7.0).collect())
    brute = sorted((r["pid"], r["iid"]) for r in pts.join(
        ivs, (F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
        .collect())
    assert fast == brute


def test_plan_is_equi_join_not_nested_loop(spark):
    pts = _pts(spark, [(1, 5.0)])
    ivs = _ivs(spark, [(100, 0.0, 10.0)])
    plan = range_join(pts, ivs, "p", "lo", "hi", 10.0)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
