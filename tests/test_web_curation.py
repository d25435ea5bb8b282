"""Planted-case tests for the web-curation trio: C4 page/line rules,
URL canonicalization + dedup, SemDeDup within-cluster embedding prune."""

import pytest

from modern_search_engines_spark.operators import c4filters, urlnorm


# ---------------------------------------------------------------------------
# c4_quality_filters
# ---------------------------------------------------------------------------


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict()
            for r in c4filters.c4_quality_filters(df, **kw).collect()}


GOOD_LINE = "this sentence has exactly seven useful words."


def test_c4_line_rules(spark):
    got = _c4(spark, [
        (1, GOOD_LINE + "\nno terminal punctuation on this line\n"
            + "too short line.\n"
            + "please enable JavaScript to continue browsing here.\n"
            + GOOD_LINE),
    ])
    r = got[1]
    assert r["n_lines"] == 5
    assert r["n_lines_kept"] == 2          # the two GOOD_LINEs
    assert r["n_sentences"] == 2
    assert r["fail_reason"] == "n_sentences"   # 2 < 3


def test_c4_page_rule_order(spark):
    three = "\n".join([GOOD_LINE] * 3)
    got = _c4(spark, [
        (1, three),
        (2, three + "\nwe meet Lorem Ipsum dolor here { casino"),
        (3, three + "\ncode { block"),
        (4, three + "\nbig casino words"),
        (5, "short."),
        (6, ""),
    ])
    assert got[1]["keep"] and got[1]["fail_reason"] is None
    assert got[2]["fail_reason"] == "lorem_ipsum"   # wins over brace/bad
    assert got[3]["fail_reason"] == "brace"
    assert got[4]["fail_reason"] == "bad_word"
    assert got[5]["fail_reason"] == "n_sentences"
    assert got[6] == {"doc_id": 6, "n_lines": 0, "n_lines_kept": 0,
                      "n_sentences": 0, "keep": False,
                      "fail_reason": "n_sentences",
                      "clean_md5": got[6]["clean_md5"]}


def test_c4_clean_text_is_kept_lines(spark):
    import hashlib
    text = GOOD_LINE + "\ndropped line\n" + GOOD_LINE
    got = _c4(spark, [(1, text)])
    expect = hashlib.md5(
        (GOOD_LINE + "\n" + GOOD_LINE).encode()).hexdigest()
    assert got[1]["clean_md5"] == expect


def test_c4_terminal_quote_and_question(spark):
    got = _c4(spark, [
        (1, 'he said these exact five words."'),
        (2, "are these exactly five words?"),
        (3, "these are exactly five words!"),
    ])
    assert all(got[i]["n_lines_kept"] == 1 for i in (1, 2, 3))


# ---------------------------------------------------------------------------
# canonical_url_expr / dedup_by_canonical_url
# ---------------------------------------------------------------------------


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["doc_id", "url"])
    out = df.select("doc_id",
                    urlnorm.canonical_url_expr("url").alias("c")).collect()
    return [r["c"] for r in sorted(out, key=lambda r: r["doc_id"])]


def test_url_canonical_forms(spark):
    got = _canon(spark, [
        "HTTP://Example.COM:80/a//b?utm_source=x&id=7",
        "http://example.com/a/b?id=7#frag",
        "https://www.example.com/a/b/",
        "https://example.com:443/a/b",
        "http://example.com/c?b=2&a=1&fbclid=abc",
        "http://example.com:8080/x",     # non-default port preserved
        "https://example.com:80/x",      # :80 is NOT https-default
        "not a url",
        "ftp://Example.com/x",           # other scheme: no port rule
    ])
    assert got[0] == "http://example.com/a/b?id=7"
    assert got[1] == "http://example.com/a/b?id=7"
    assert got[2] == "https://example.com/a/b"
    assert got[3] == "https://example.com/a/b"
    assert got[4] == "http://example.com/c?a=1&b=2"   # sorted, fbclid gone
    assert got[5] == "http://example.com:8080/x"
    assert got[6] == "https://example.com:80/x"
    assert got[7] is None
    assert got[8] == "ftp://example.com/x"


def test_url_dedup_winner_and_nulls(spark):
    df = spark.createDataFrame([
        (10, "http://example.com/a"),
        (11, "HTTP://EXAMPLE.com/a/"),
        (12, "junk"),
        (13, "more junk"),
    ], ["doc_id", "url"])
    got = {r["doc_id"]: r.asDict()
           for r in urlnorm.dedup_by_canonical_url(df).collect()}
    assert got[10]["keep"] and got[10]["dup_of"] is None
    assert not got[11]["keep"] and got[11]["dup_of"] == 10
    assert got[12]["keep"] and got[12]["canonical_url"] is None
    assert got[13]["keep"]


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def _sem(spark, rows, **kw):
    from modern_search_engines_spark.operators.similarity import semdedup
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    return {r["vec_id"]: r.asDict() for r in semdedup(df, **kw).collect()}


def test_semdedup_within_cluster_only(spark):
    v = [1.0, 0.0, 0.0]
    got = _sem(spark, [
        (1, 0, v), (2, 0, v),        # same cluster, identical -> dup
        (3, 1, v),                   # identical but other cluster -> kept
        (4, 0, [0.0, 1.0, 0.0]),     # same cluster, orthogonal -> kept
    ], threshold=0.9)
    assert got[1]["keep"] and got[1]["dup_of"] is None
    assert not got[2]["keep"] and got[2]["dup_of"] == 1
    assert got[3]["keep"]
    assert got[4]["keep"]


def test_semdedup_chain_uses_min_dominator(spark):
    # cos(a,b) and cos(b,c) clear 0.9 but cos(a,c) does not: c's only
    # dominator is b (dropped itself) — dominated-by-any-earlier keeps
    # ONE representative per chain end-to-end, like the paper's
    # one-per-group policy, and dup_of names the smallest dominator
    import math
    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0]
    a, b, c = vec(0.0), vec(0.35), vec(0.7)
    got = _sem(spark, [(1, 0, a), (2, 0, b), (3, 0, c)], threshold=0.9)
    assert got[1]["keep"]
    assert got[2]["dup_of"] == 1
    assert got[3]["dup_of"] == 2


def test_semdedup_cluster_cap_guard(spark):
    rows = [(i, 0, [1.0, float(i)]) for i in range(10)]
    with pytest.raises(ValueError, match="max_cluster_docs"):
        _sem(spark, rows, threshold=0.99, max_cluster_docs=5)
    got = _sem(spark, rows, threshold=1.1, max_cluster_docs=100)
    assert all(r["keep"] for r in got.values())


def test_semdedup_auto_guard_raises_on_degenerate_cluster(spark):
    # default guard ("auto", cap = max(200, 10*sqrt(N))) must refuse a
    # single 1100-row cluster (cap = 331) without being asked
    rows = [(i, 0, [1.0, float(i)]) for i in range(1100)]
    with pytest.raises(ValueError, match="quadratic"):
        _sem(spark, rows, threshold=0.999)
    # explicit opt-out still runs it (bounded-upstream escape hatch)
    got = _sem(spark, rows[:8], threshold=1.1, max_cluster_docs=None)
    assert all(r["keep"] for r in got.values())


def test_semdedup_auto_guard_passes_balanced_clusters(spark):
    # 300 rows in 20 clusters of 15 — far under the auto cap; the
    # default path must run, not raise
    rows = [(i, i % 20, [1.0, float(i)]) for i in range(300)]
    got = _sem(spark, rows, threshold=1.1)
    assert len(got) == 300 and all(r["keep"] for r in got.values())


def test_semdedup_layout_independent(spark):
    from modern_search_engines_spark.operators.similarity import semdedup
    import math
    rows = [(i, i % 3, [math.cos(i * 0.2), math.sin(i * 0.2)])
            for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    a = semdedup(df, threshold=0.95)
    b = semdedup(df.repartition(7, "embedding"), threshold=0.95)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_url_canonicalization_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the canonical form is
    a fixed point, so re-normalizing an already-normalized table (the
    common operational accident) is a no-op."""
    urls = [
        "HTTP://Example.COM:80/a//b?utm_source=x&id=7",
        "http://example.com/a/b?id=7#frag",
        "https://www.example.com/a/b/",
        "https://example.com:443///x//y///z?b=2&a=1&gclid=9",
        "http://example.com:8080/x?z=1&y=2",
        "ftp://Example.com/x",
        "https://www.www.example.com/",     # only ONE www. stripped
    ]
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["doc_id", "url"])
    once = df.select("doc_id",
                     urlnorm.canonical_url_expr("url").alias("url"))
    twice = once.select("doc_id",
                        urlnorm.canonical_url_expr("url").alias("url"))
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
