"""Distributed connected components (operators/dedup.py) — the
transitive-closure layer of the near-dup pipeline.

Oracle: a 20-line pure-python union-find. The Spark algorithm
(large-star/small-star) must assign every node the min id of its
component on random graphs, chains, cliques, and string ids; the
cleaning pipeline's transitive mode must keep exactly one survivor per
component (vs greedy keep-first, which also keeps nodes that are
locally-min but not component-min).
"""

import random

from pyspark.sql import functions as F

from modern_search_engines_spark.operators import dedup
from modern_search_engines_spark.plans import clean


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    # canonicalize to min member per component
    best = {}
    for n, r in comp.items():
        best[r] = min(best.get(r, n), n)
    return {n: best[r] for n, r in comp.items()}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = dedup.connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_chain_collapses_transitively(spark):
    # a~b, b~c but a and c share no edge: one component, min id wins
    assert _cc_spark(spark, [(1, 2), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_two_components_and_clique(spark):
    got = _cc_spark(spark, [(5, 9), (9, 7), (20, 30), (30, 20), (7, 5)])
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_spark(spark, edges) == _union_find(edges), trial


def test_non_convergence_raises_not_silently_wrong(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iter=1)


def test_string_ids_order_lexicographically(spark):
    df = spark.createDataFrame(
        [("bb", "aa"), ("bb", "cc"), ("zz", "yy")],
        "doc_a string, doc_b string")
    out = {r["node"]: r["component"]
           for r in dedup.connected_components(df).collect()}
    assert out == {"aa": "aa", "bb": "aa", "cc": "aa",
                   "yy": "yy", "zz": "yy"}


def test_giant_component_spanning_90pct_converges_correctly(spark):
    """One component covering 90% of nodes (the mega-key case: its min
    label becomes the hottest join key in late rounds) must converge in
    the O(log² n) bound and label every member with the global min —
    exercised THROUGH the hot-key broadcast split (hot_key_rows=64, so
    the giant component's hub key takes the broadcast branch every
    round)."""
    n = 2000
    giant = [(i, i + 1) for i in range(int(n * 0.9) - 1)]  # 1800-chain
    rest = [(k, k + 1) for k in range(int(n * 0.9), n - 1, 2)]
    df = spark.createDataFrame(giant + rest, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(
               df, hot_key_rows=64).collect()}
    want = _union_find(giant + rest)
    assert got == want
    assert sum(1 for c in got.values() if c == 0) == int(n * 0.9)
    # and the default path agrees
    assert _cc_spark(spark, giant + rest) == want


def test_cc_hot_min_join_broadcasts_hot_keys(spark):
    """The skewed shape inside a CC round is the min-label join where a
    mega-component hub key holds most rows. AQE's skew-join CANNOT
    split it (its rule needs two bare shuffle stages under the SMJ; the
    mins side aggregates after its shuffle — verified empirically), so
    ``_skew_safe_min_join`` must route hot keys through a broadcast
    branch — asserted on the plan — and return exactly the plain join's
    rows."""
    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 3000)] +
        [(j, j + 1) for j in range(1, 64)], "u long, v long")
    mins = hub.groupBy("u").agg(F.min("v").alias("m"),
                                F.count(F.lit(1)).alias("n"))
    safe = dedup._skew_safe_min_join(hub, mins, "u", hot_cap=100)
    plan = safe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    want = sorted(tuple(r) for r in hub.join(mins.drop("n"), "u")
                  .select("u", "v", "m").collect())
    got = sorted(tuple(r) for r in safe.select("u", "v", "m").collect())
    assert got == want


def test_transitive_clean_keeps_one_survivor_per_component(spark):
    # ids 1 < 2 < 3. doc3 is a shared core; docs 1 and 2 extend it with
    # disjoint 6-token tails: 10 shared trigrams of 16 each, so
    # j(1,3) = j(2,3) = 10/16 = 0.625 ≥ 0.5 but j(1,2) = 10/22 ≈ 0.45
    # < 0.5 — a chain 1~3~2 with no direct 1~2 edge. Nodes 1 and 2 are
    # each only ever doc_a of their pair (never a doc_b), so GREEDY
    # keeps {1, 2} while TRANSITIVE keeps only the component min {1}.
    core = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 alpha beta"
    texts = [(1, core + " g1 g2 g3 g4 g5 g6"),
             (2, core + " d1 d2 d3 d4 d5 d6"),
             (3, core),
             (4, "completely different words entirely unrelated content "
                 "nothing shared here at all with the others whatsoever")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    kwargs = dict(langs=("en",), min_tokens=1, max_rep_ratio=0.5,
                  jaccard_threshold=0.5, n_minhash=8, n_bands=8)
    greedy = clean.classify_docs(docs, **kwargs)
    trans = clean.classify_docs(docs, transitive=True, **kwargs)
    g = {r["doc_id"]: r["status"] for r in greedy.collect()}
    t = {r["doc_id"]: r["status"] for r in trans.collect()}
    assert t == {1: "kept", 2: "near_dup", 3: "near_dup", 4: "kept"}
    assert g == {1: "kept", 2: "kept", 3: "near_dup", 4: "kept"}
    # ^ doc 2 is the greedy blind spot the transitive mode fixes
