"""Planted-case tests for the round-4 curation additions: DSIR
importance weights, cross-doc duplicated-gram fraction, per-cluster
keep-best representative, and the Gopher-style composite quality gate.
(Their cross-engine value parity is covered by test_contract_oracle;
these tests pin the SEMANTICS on hand-built corpora.)"""

import pytest
from pyspark.sql import Row, functions as F

from modern_search_engines_spark.operators import dedup, dsir, quality


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _dsir_corpus(spark):
    rows = []
    # target docs: dominated by the token "medical"; off-target: "spam"
    for i in range(8):
        rows.append(Row(doc_id=i, text="medical journal study result",
                        tgt=True))
    for i in range(8, 16):
        rows.append(Row(doc_id=i, text="spam casino deal offer", tgt=False))
    # a raw doc that LOOKS like the target, and one that doesn't
    rows.append(Row(doc_id=100, text="medical study result", tgt=False))
    rows.append(Row(doc_id=101, text="casino offer deal", tgt=False))
    rows.append(Row(doc_id=102, text="", tgt=False))  # empty
    return spark.createDataFrame(rows)


def test_dsir_orders_target_like_docs_first(spark):
    docs = _dsir_corpus(spark)
    w = dsir.dsir_log_weights(docs, F.col("tgt"), n_buckets=32)
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    assert len(got) == docs.count()  # every doc scored, even the empty one
    assert got[102] == 0.0  # no grams -> weight exactly 0
    # the target-like raw doc must outscore the spam-like raw doc
    assert got[100] > got[101]
    # and target-domain docs outscore off-target ones
    assert min(got[i] for i in range(8)) > max(got[i] for i in range(8, 16))


def test_dsir_layout_independent(spark):
    docs = _dsir_corpus(spark)
    a = dsir.dsir_log_weights(docs, F.col("tgt"), n_buckets=32)
    b = dsir.dsir_log_weights(docs.repartition(7, "text"), F.col("tgt"),
                              n_buckets=32)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# duplicated_gram_fraction
# ---------------------------------------------------------------------------


def test_dup_gram_fraction_planted(spark):
    sh = spark.createDataFrame(
        [("a", "x y z"), ("a", "p q r"),          # 1 of 2 shared
         ("b", "x y z"),                           # 1 of 1 shared
         ("c", "u v w"), ("c", "s t u")],          # nothing shared
        ["doc_id", "sh"])
    got = {r["doc_id"]: (r["n_shingles"], r["dup_fraction"])
           for r in dedup.duplicated_gram_fraction(sh).collect()}
    assert got == {"a": (2, 0.5), "b": (1, 1.0), "c": (2, 0.0)}


# ---------------------------------------------------------------------------
# keep_best_representative
# ---------------------------------------------------------------------------


def test_keep_best_argmax_and_tiebreak(spark):
    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (7, 7), (8, 8)],
        ["doc_id", "component"])
    qual = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 4), (8, 1)], ["doc_id", "score"])
    got = {r["component"]: (r["keep_doc_id"], r["keep_score"],
                            r["n_members"])
           for r in dedup.keep_best_representative(comps, qual).collect()}
    # component 10: max score 9 held by docs 2 and 3 -> tie broken to 2
    assert got[10] == (2, 9, 3)
    assert got[7] == (7, 4, 1)  # singletons keep themselves
    assert got[8] == (8, 1, 1)


# ---------------------------------------------------------------------------
# gopher_quality_filter
# ---------------------------------------------------------------------------


def _gopher(spark, text):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return quality.gopher_quality_filter(df).collect()[0]


GOOD = ("the quick brown fox jumps over the lazy dog and that dog did "
        "have quite a day with many words to spare in this long enough "
        "sentence that keeps going and going with varied tokens every "
        "time so that none of the trigram windows repeat themselves at "
        "all here today friends")  # >=50 tokens, varied, required words


def test_gopher_passes_good_doc(spark):
    r = _gopher(spark, GOOD)
    assert r["keep"] is True and r["fail_reason"] is None
    assert r["n_tokens"] >= 50


@pytest.mark.parametrize("text,reason", [
    ("too short", "n_tokens"),
    # 50 tokens of 1-char words -> avg_token_len < 3 fires (n_tokens ok)
    (" ".join(["a"] * 25 + ["b"] * 25), "avg_token_len"),
    # 50 varied medium words, no Gopher-required word present
    (" ".join(f"word{i:02d}" for i in range(50)), "required_words"),
    # required words present but one trigram repeated en masse
    ("the be to of " + " ".join(["dup trigram here"] * 16), "rep_ratio"),
])
def test_gopher_fail_reasons(spark, text, reason):
    r = _gopher(spark, text)
    assert r["keep"] is False and r["fail_reason"] == reason


def test_gopher_rule_order_names_first_failure(spark):
    # fails BOTH n_tokens and required_words -> n_tokens is named
    r = _gopher(spark, "zz qq")
    assert r["fail_reason"] == "n_tokens"


# ---------------------------------------------------------------------------
# remove_duplicate_spans (ExactSubstr)
# ---------------------------------------------------------------------------


def _span(spark, rows, k):
    from modern_search_engines_spark.operators import spandedup
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = spandedup.remove_duplicate_spans(df, k=k)
    return {r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"],
                          r["clean_text"]) for r in out.collect()}


def test_span_dedup_first_occurrence_wins(spark):
    got = _span(spark, [
        (1, "a b c d e f g h"),
        (2, "x y a b c d z w"),
        (3, "a b c d a b c d q"),   # loses twice -> merged removal
        (4, "unique tokens only here"),
        (5, ""),
    ], k=4)
    assert got[1] == (8, 8, "a b c d e f g h")  # winner keeps the span
    assert got[2] == (8, 4, "x y z w")
    assert got[3] == (9, 1, "q")    # [1,5)+[5,9) merge into [1,9)
    assert got[4] == (4, 4, "unique tokens only here")
    assert got[5] == (0, 0, "")


def test_span_dedup_interval_merge_boundaries(spark):
    # doc 2 duplicates doc 1's k-gram at positions 1 and exactly 1+k:
    # touching intervals must merge into one removal, and a gap of
    # k+1 must NOT merge (the middle token survives)
    k = 3
    got = _span(spark, [
        (1, "a b c"),
        (2, "a b c a b c tail"),       # touching: [1,4) + [4,7)
        (3, "a b c q a b c"),          # gap: [1,4) + [5,8), q kept
    ], k=k)
    assert got[2] == (7, 1, "tail")
    assert got[3] == (7, 1, "q")


def test_span_dedup_layout_independent(spark):
    from modern_search_engines_spark.operators import spandedup
    rows = [(i, f"common prefix tokens here {i} suffix run") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = spandedup.remove_duplicate_spans(df, k=4)
    b = spandedup.remove_duplicate_spans(df.repartition(7, "text"), k=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- Gopher duplicate-line screens (line_repetition_stats) ------------

def test_line_repetition_stats_planted(spark):
    d = spark.createDataFrame([
        (0, "aaa\nbbb\nccc"),             # no dups
        (1, "aaa\naaa\nbb"),              # 1 repeated occurrence of 3
        (2, "x\nx\nx\nx"),                # 3 repeats of 4
        (3, ""),                          # empty
        (4, "solo"),
        (5, "long line here\n\nlong line here"),  # empty line dropped
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           quality.line_repetition_stats(d).collect()}
    assert (got[0]["n_lines"], got[0]["dup_line_frac"]) == (3, 0.0)
    assert got[1]["n_lines"] == 3
    assert abs(got[1]["dup_line_frac"] - 1 / 3) < 1e-6
    # chars: aaa aaa bb -> total 8, distinct 5 -> 3/8
    assert abs(got[1]["dup_char_frac"] - 3 / 8) < 1e-6
    assert got[2]["dup_line_frac"] == 0.75
    assert (got[3]["n_lines"], got[3]["dup_line_frac"],
            got[3]["dup_char_frac"]) == (0, 0.0, 0.0)
    assert got[4]["dup_line_frac"] == 0.0
    assert got[5]["n_lines"] == 2 and got[5]["dup_line_frac"] == 0.5


def test_line_repetition_stats_is_map_only(spark):
    d = spark.createDataFrame([(0, "a\nb")], "doc_id long, text string")
    plan = quality.line_repetition_stats(d) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_line_repetition_sep_is_literal_not_regex(spark):
    d = spark.createDataFrame([(0, "aa|bb|aa")], "doc_id long, text string")
    r = quality.line_repetition_stats(d, sep="|").collect()[0]
    assert r["n_lines"] == 3          # '|' split as text, not regex-alternation
    assert abs(r["dup_line_frac"] - 1 / 3) < 1e-6
