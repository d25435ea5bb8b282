"""doc2query / summarizer hook plumbing (SURVEY.md §2.9-7)."""

import pytest
from pyspark.sql import functions as F

from modern_search_engines_spark import textlib
from modern_search_engines_spark.operators import mlhooks


def test_fake_generator_deterministic():
    text = "Castle tours in the old town. The castle museum opens daily."
    a = mlhooks._fake_query_generator(text)
    b = mlhooks._fake_query_generator(text)
    assert a == b
    assert 1 <= len(a) <= mlhooks.NUM_SAMPLES
    assert all(q for q in a)


def test_doc2query_appends_tokens(spark):
    df = spark.createDataFrame(
        [(1, "castle museum tour castle", ["castle", "museum"]),
         (2, "", ["x"])],
        "doc_id long, text string, single_tokens array<string>")
    out = {r["doc_id"]: r["single_tokens"]
           for r in mlhooks.doc2query_expand(df).collect()}
    # original tokens preserved as a prefix, expansions appended
    assert out[1][:2] == ["castle", "museum"]
    assert len(out[1]) > 2
    expected_extra = []
    for q in mlhooks._fake_query_generator("castle museum tour castle"):
        expected_extra.extend(textlib.tokenize(q, ngram_max=1))
    assert out[1][2:] == expected_extra
    assert out[2] == ["x"]  # empty text → no expansion


def test_fake_summarizer_bounds():
    text = ". ".join(f"sentence number {i} has exactly six words"
                     for i in range(100))
    s = mlhooks._fake_summarizer(text)
    n = len(s.split())
    assert mlhooks.SUMMARY_MIN_WORDS <= n <= mlhooks.SUMMARY_MAX_WORDS
    short = mlhooks._fake_summarizer("just three words")
    assert short == "just three words"
    assert mlhooks._fake_summarizer("") == ""


def test_summarize_column(spark):
    df = spark.createDataFrame(
        [(1, "one sentence. another sentence.")],
        "doc_id long, text string")
    row = mlhooks.summarize(df).collect()[0]
    assert row["summary"] == mlhooks._fake_summarizer(
        "one sentence. another sentence.")


def test_real_hooks_raise():
    with pytest.raises(NotImplementedError):
        mlhooks.real_query_generator("x")
    with pytest.raises(NotImplementedError):
        mlhooks.real_summarizer("x")


def test_pluggable(spark):
    mlhooks.set_summarizer(lambda t: "S")
    try:
        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        assert mlhooks.summarize(df).collect()[0]["summary"] == "S"
    finally:
        mlhooks.set_summarizer(mlhooks._fake_summarizer)
