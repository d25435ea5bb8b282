"""Planted-case tests for the as-of join (backward, strict, tolerance,
same-row payload consistency) vs hand-computed expectations."""

import datetime as dt

from pyspark.sql import Row

from modern_search_engines_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame([
        Row(event_id=1, user_id=10, ts=_ts(5)),
        Row(event_id=2, user_id=10, ts=_ts(20)),
        Row(event_id=3, user_id=10, ts=_ts(2)),    # before any right
        Row(event_id=4, user_id=99, ts=_ts(30)),   # user with no rights
    ])
    right = spark.createDataFrame([
        Row(user_id=10, ts=_ts(3), value=1.0, note="a"),
        Row(user_id=10, ts=_ts(5), value=2.0, note=None),   # NULL field
        Row(user_id=10, ts=_ts(15), value=3.0, note="c"),
    ])
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {r["event_id"]: r.asDict() for r in asof_join(
        left, right, right_cols=("value", "note")).collect()}
    assert got[1]["value_r"] == 2.0 and got[1]["ts_r"] == _ts(5)
    # same matched ROW: note_r must be the NULL from the ts=5 right row,
    # not 'a' leaking from the older row
    assert got[1]["note_r"] is None
    assert got[2]["value_r"] == 3.0 and got[2]["note_r"] == "c"
    assert got[3]["value_r"] is None and got[3]["ts_r"] is None
    assert got[4]["value_r"] is None


def test_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    got = {r["event_id"]: r.asDict() for r in asof_join(
        left, right, right_cols=("value",), strict=True).collect()}
    assert got[1]["value_r"] == 1.0      # ts=5 right row now invisible
    assert got[2]["value_r"] == 3.0


def test_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    got = {r["event_id"]: r.asDict() for r in asof_join(
        left, right, right_cols=("value",), tolerance_s=4).collect()}
    assert got[1]["value_r"] == 2.0      # 0 s gap
    assert got[2]["value_r"] is None     # 5 s gap > 4 s tolerance
    assert got[2]["ts_r"] is None


def test_layout_independent(spark):
    left, right = _frames(spark)
    a = sorted(map(tuple, asof_join(left, right,
                                    right_cols=("value",)).collect()))
    b = sorted(map(tuple, asof_join(
        left.repartition(7, "ts"), right.repartition(5, "value"),
        right_cols=("value",)).collect()))
    assert a == b


def test_matches_pandas_merge_asof(spark):
    """Property check vs pandas' reference implementation on a random
    but deterministic instance."""
    import pandas as pd
    rows_l = [(i, i % 7, _ts((i * 13) % 50)) for i in range(60)]
    rows_r = [(i % 7, _ts((i * 7) % 50), float(i)) for i in range(40)]
    left = spark.createDataFrame(rows_l, ["event_id", "user_id", "ts"])
    right = (spark.createDataFrame(rows_r, ["user_id", "ts", "value"])
             .groupBy("user_id", "ts").agg(
                 __import__("pyspark.sql.functions", fromlist=["max"])
                 .max("value").alias("value")))   # tie-free right side
    got = {r["event_id"]: r["value_r"] for r in asof_join(
        left, right, right_cols=("value",)).collect()}
    pl = pd.DataFrame(rows_l, columns=["event_id", "user_id", "ts"])
    pr = (pd.DataFrame(rows_r, columns=["user_id", "ts", "value"])
          .groupby(["user_id", "ts"], as_index=False)["value"].max())
    exp = pd.merge_asof(pl.sort_values("ts"), pr.sort_values("ts"),
                        on="ts", by="user_id", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["value"]) else row["value"]
        assert got[row["event_id"]] == want, row["event_id"]


def _megakey_instance():
    """One pathological key holding 1500 of 1560 events plus two normal
    keys — the hot-key case the bucketed two-phase plan exists for."""
    rows_l = [(i, 1, _ts(0) + dt.timedelta(seconds=(i * 37) % 7200))
              for i in range(1500)]
    rows_l += [(10_000 + i, 2 + (i % 2),
                _ts(0) + dt.timedelta(seconds=i * 11)) for i in range(60)]
    rows_r = [(1, _ts(0) + dt.timedelta(seconds=(i * 53) % 7200),
               float(i)) for i in range(400)]
    rows_r += [(2 + (i % 2), _ts(0) + dt.timedelta(seconds=i * 29),
                1000.0 + i) for i in range(30)]
    return rows_l, rows_r


def test_bucketed_matches_pandas_on_planted_megakey(spark):
    """bucket_s two-phase variant vs pandas.merge_asof on a planted
    mega-key (1500/1560 events on one key): identical matches,
    including across bucket boundaries, with strict + tolerance too."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows_l, rows_r = _megakey_instance()
    left = spark.createDataFrame(rows_l, ["event_id", "user_id", "ts"])
    right = (spark.createDataFrame(rows_r, ["user_id", "ts", "value"])
             .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    pl = pd.DataFrame(rows_l, columns=["event_id", "user_id", "ts"])
    pr = (pd.DataFrame(rows_r, columns=["user_id", "ts", "value"])
          .groupby(["user_id", "ts"], as_index=False)["value"].max())

    for strict, tol in ((False, None), (True, None), (False, 120.0)):
        got = {r["event_id"]: r["value_r"] for r in asof_join(
            left, right, right_cols=("value",), strict=strict,
            tolerance_s=tol, bucket_s=600.0).collect()}
        exp = pd.merge_asof(
            pl.sort_values("ts"), pr.sort_values("ts"), on="ts",
            by="user_id", direction="backward",
            allow_exact_matches=not strict,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol))
        assert len(got) == len(pl)
        for _, row in exp.iterrows():
            want = None if pd.isna(row["value"]) else row["value"]
            assert got[row["event_id"]] == want, (
                strict, tol, row["event_id"])


def test_bucketed_identical_to_single_window(spark):
    """The bucketed plan is the same OPERATOR: full-row equality with
    the single-window path on the mega-key instance, at a bucket width
    that forces many boundary carries and at one wider than the span
    (degenerate single bucket)."""
    rows_l, rows_r = _megakey_instance()
    left = spark.createDataFrame(rows_l, ["event_id", "user_id", "ts"])
    from pyspark.sql import functions as F
    right = (spark.createDataFrame(rows_r, ["user_id", "ts", "value"])
             .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    base = sorted(map(tuple, asof_join(
        left, right, right_cols=("value",)).collect()))
    for bucket_s in (60.0, 1e9):
        got = sorted(map(tuple, asof_join(
            left, right, right_cols=("value",),
            bucket_s=bucket_s).collect()))
        assert got == base, bucket_s
