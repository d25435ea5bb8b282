"""Hashed-linear (fastText-style) quality classifier: default LCG
stand-in path vs trained-weights path, empty-doc edge, plan shape.
The cross-engine twin lives in test_contract_oracle.py."""

from pyspark.sql import functions as F

from modern_search_engines_spark.operators import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lcg(bucket: int) -> int:
    return (bucket * 1103515245 + 12345) % 4096 - 2048


def _buckets(text: str, n_buckets: int) -> list[int]:
    import hashlib
    toks = [t for t in text.split(" ") if t]
    feats = [f"u:{t}" for t in toks] + [
        f"b:{a} {b}" for a, b in zip(toks, toks[1:])]
    return [int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets
            for f in feats]


class TestDefaultPath:
    def test_matches_independent_python_model(self, spark):
        texts = ["alpha beta gamma", "one two three four five", "solo"]
        d = _docs(spark, list(enumerate(texts)))
        got = {r["doc_id"]: r for r in
               quality.hashed_linear_quality(d).collect()}
        for i, t in enumerate(texts):
            bks = _buckets(t, quality.QC_N_BUCKETS)
            s = sum(_lcg(b) for b in bks)
            raw = s / (2048.0 * len(bks))
            assert got[i]["n_feats"] == len(bks)
            assert abs(got[i]["score"] - round(raw, 6)) < 1e-9
            assert got[i]["label"] == (raw > 0)
            assert -1.0 <= got[i]["score"] <= 1.0

    def test_empty_doc_is_neutral(self, spark):
        d = _docs(spark, [(0, ""), (1, "   ")])
        rows = {r["doc_id"]: r for r in
                quality.hashed_linear_quality(d).collect()}
        for r in rows.values():
            assert (r["n_feats"], r["score"], r["prob"], r["label"]) \
                == (0, 0.0, 0.5, False)

    def test_default_path_is_map_only(self, spark):
        d = _docs(spark, [(i, "a b c d") for i in range(20)])
        plan = quality.hashed_linear_quality(d) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestTrainedWeightsPath:
    def test_equals_default_when_weights_enumerate_the_lcg(self, spark):
        # a small bucket space so the full weight table is enumerable:
        # the trained path fed the LCG weights must reproduce the
        # default path exactly (same sums, same rounding)
        nb = 64
        d = _docs(spark, [(i, t) for i, t in enumerate(
            ["alpha beta gamma delta", "one two", "x y z x y z", ""])])
        w = spark.createDataFrame(
            [(b, float(_lcg(b))) for b in range(nb)],
            "bucket long, weight double")
        base = {r["doc_id"]: r for r in
                quality.hashed_linear_quality(d, n_buckets=nb).collect()}
        # default integer path divides by 2048; the weight table carries
        # the raw integers, so scale scores by 2048 before comparing
        got = {r["doc_id"]: r for r in
               quality.hashed_linear_quality(d, weights=w,
                                             n_buckets=nb).collect()}
        for i in base:
            assert got[i]["n_feats"] == base[i]["n_feats"]
            assert abs(got[i]["score"] / 2048.0
                       - base[i]["score"]) < 1e-6, i

    def test_missing_buckets_weigh_zero(self, spark):
        d = _docs(spark, [(0, "aa bb")])  # 3 feats: u:aa u:bb b:aa bb
        bks = _buckets("aa bb", quality.QC_N_BUCKETS)
        # weight only the first feature's bucket
        w = spark.createDataFrame([(bks[0], 3.0)],
                                  "bucket long, weight double")
        row = quality.hashed_linear_quality(d, weights=w).collect()[0]
        assert row["n_feats"] == 3
        assert abs(row["score"] - round(3.0 / 3, 6)) < 1e-9

    def test_weights_join_is_broadcast(self, spark):
        d = _docs(spark, [(i, "a b c") for i in range(20)])
        w = spark.createDataFrame([(0, 1.0)], "bucket long, weight double")
        plan = quality.hashed_linear_quality(d, weights=w) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
