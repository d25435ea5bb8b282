"""Winnowing fingerprint properties + Spark plumbing."""

from modern_search_engines_spark.operators import fingerprint as fp


def test_deterministic_and_normalized():
    t = "The quick   brown fox JUMPS over the lazy dog again and again"
    a = fp.winnow_fingerprints(t)
    assert a == fp.winnow_fingerprints(t)
    # whitespace/case normalization
    assert a == fp.winnow_fingerprints(
        "  the QUICK brown\nfox jumps over the lazy dog again and again ")
    assert fp.winnow_fingerprints("") == []
    assert fp.winnow_fingerprints("short") == []


def test_common_substring_guarantee():
    """Any shared run >= WINDOW+KGRAM-1 chars must share a fingerprint."""
    core = "unmistakably unique shared passage of text here"
    d1 = "prefix one two three " + core + " suffix alpha"
    d2 = "totally different beginning " + core + " and ending"
    s1, s2 = set(fp.winnow_fingerprints(d1)), set(fp.winnow_fingerprints(d2))
    assert s1 & s2


def test_disjoint_texts_share_nothing():
    s1 = set(fp.winnow_fingerprints("aaaa bbbb cccc dddd eeee ffff"))
    s2 = set(fp.winnow_fingerprints("gggg hhhh iiii jjjj kkkk llll"))
    assert not (s1 & s2)


def test_near_dup_pairs_spark(spark):
    docs = spark.createDataFrame(
        [(1, "the winnowing algorithm selects minimum hashes per window"),
         (2, "the winnowing algorithm selects minimum hashes per window "
             "with a small suffix change"),
         (3, "completely unrelated content about rivers and castles")],
        "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in fp.fingerprint_near_dups(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    plan = fp.fingerprint_near_dups(docs)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
