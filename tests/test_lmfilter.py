"""Planted-case tests for the CCNet-style bigram-LM perplexity filter
and the per-language head/middle/tail percentile buckets."""

import math

import pytest

from modern_search_engines_spark.operators import lmfilter


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict()
            for r in lmfilter.lm_score(df, **kw).collect()}


def test_lm_score_hand_computed(spark):
    # train == score corpus: "a b" x2 and "a c". V = {a,b,c} = 3,
    # n(a,b)=2 n(a,c)=1 n(a)=3; k=0.5:
    #   P(b|a) = 2.5/4.5, P(c|a) = 1.5/4.5
    got = _score(spark, [(1, "a b"), (2, "a b"), (3, "a c")], k=0.5)
    nll_b = -math.log(2.5 / 4.5)
    nll_c = -math.log(1.5 / 4.5)
    assert got[1]["nll"] == pytest.approx(nll_b, abs=1e-6)
    assert got[3]["nll"] == pytest.approx(nll_c, abs=1e-6)
    assert got[1]["nll"] < got[3]["nll"]          # frequent pair = better
    assert got[1]["ppl"] == pytest.approx(4.5 / 2.5, abs=0.01)
    assert got[1]["n_bigrams"] == 1


def test_lm_score_unseen_grams_and_short_docs(spark):
    train_rows = [(0, "the cat sat on the mat")]
    import pyspark.sql.functions as F  # noqa: F401
    train = None
    got = _score(spark, train_rows + [(1, "zz qq"), (2, "one"), (3, "")],
                 k=0.5)
    # unseen context: P = k / (k*V) = 1/V, V=5 distinct train+score? no:
    # train defaults to the SCORE corpus here -> V includes zz/qq/one
    assert got[1]["nll"] is not None
    assert got[2]["nll"] is None and got[2]["n_bigrams"] == 0
    assert got[3]["nll"] is None and got[3]["ppl"] is None
    # separate train corpus: vocabulary comes from train only
    spark_train = _mkdf(spark, train_rows)
    got2 = {r["doc_id"]: r.asDict() for r in lmfilter.lm_score(
        _mkdf(spark, [(1, "zz qq")]), train=spark_train, k=0.5).collect()}
    # V=5 (the cat sat on mat); unseen ctx+gram: -ln(0.5 / (0.5*5))
    assert got2[1]["nll"] == pytest.approx(math.log(5.0), abs=1e-6)


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lm_score_repetitious_doc_scores_better(spark):
    # a doc made of the corpus's most common transitions scores lower
    # nll than one made of rare transitions — the CCNet signal
    rows = [(i, "the cat sat") for i in range(10)] + [(99, "sat cat the")]
    got = _score(spark, rows)
    assert got[0]["nll"] < got[99]["nll"]


def test_lm_score_layout_independent(spark):
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}")
            for i in range(40)]
    df = _mkdf(spark, rows)
    a = sorted(map(tuple, lmfilter.lm_score(df).collect()))
    b = sorted(map(tuple, lmfilter.lm_score(
        df.repartition(11, "text")).collect()))
    assert a == b


def test_perplexity_buckets(spark):
    rows = [(i, "en", float(i)) for i in range(10)] + \
           [(100 + i, "de", float(100 - i)) for i in range(10)] + \
           [(999, "en", None)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "nll"])
    got = {r["doc_id"]: r["bucket"]
           for r in lmfilter.perplexity_buckets(df).collect()}
    # en: nll 0..9, lo=0.3 -> t_lo=2.7, hi -> t_hi=6.3
    assert [got[i] for i in range(10)] == (
        ["head"] * 3 + ["middle"] * 4 + ["tail"] * 3)
    # de buckets are computed within de only (value range disjoint)
    assert got[100] == "tail" and got[109] == "head"
    assert got[999] is None


def test_perplexity_buckets_approx_path(spark):
    rows = [(i, "en", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "nll"])
    got = lmfilter.perplexity_buckets(df, approx=True).collect()
    counts = {b: sum(1 for r in got if r["bucket"] == b)
              for b in ("head", "middle", "tail")}
    assert counts["head"] >= 25 and counts["tail"] >= 25
