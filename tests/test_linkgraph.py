"""PageRank power iteration (operators/linkgraph.py) vs a numpy oracle
implementing the identical recurrence — both with the default leaking
dangling mass and with ``redistribute_dangling=True`` (textbook
dangling-sum correction; ranks then sum to 1)."""

import random

import numpy as np
import pytest

from modern_search_engines_spark.operators import linkgraph


def _np_pagerank(n, edges, iters=10, d=0.85, redistribute=False):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for s, t in edges:
            c[t] += r[s] / deg[s]
        extra = d * r[deg == 0].sum() / n if redistribute else 0.0
        r = (1.0 - d) / n + extra + d * c
    return r


def _spark_pagerank(spark, n, edges, iters=10, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = linkgraph.pagerank(nodes, edf, iters=iters, **kw).collect()
    got = np.zeros(n)
    for row in out:
        got[row["doc_id"]] = row["rank"]
    return got


def test_ring_graph_is_uniform(spark):
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _spark_pagerank(spark, n, edges)
    assert np.allclose(got, 1.0 / n, atol=1e-12)


def test_random_graph_matches_numpy(spark):
    rng = random.Random(99)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(70)})
    # ensure at least one node has no in-links and one is dangling:
    edges = [(s, t) for s, t in edges if t != 0 and s != n - 1]
    srcs = {s for s, _ in edges}
    got = _spark_pagerank(spark, n, edges)
    want = _np_pagerank(n, edges)
    assert np.allclose(got, want, atol=1e-9)
    # no-in-link node holds exactly the teleport mass
    assert abs(got[0] - 0.15 / n) < 1e-12
    assert n - 1 not in srcs  # the dangling node really dangles


def test_dangling_redistribution_matches_numpy_and_sums_to_one(spark):
    rng = random.Random(7)
    n = 25
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(50)})
    # plant several dangling nodes
    edges = [(s, t) for s, t in edges if s not in (n - 1, n - 2, n - 3)]
    got = _spark_pagerank(spark, n, edges, redistribute_dangling=True)
    want = _np_pagerank(n, edges, redistribute=True)
    assert np.allclose(got, want, atol=1e-9)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)  # no mass leak
    # and the default still matches the leaking recurrence
    got_leak = _spark_pagerank(spark, n, edges)
    assert np.allclose(got_leak, _np_pagerank(n, edges), atol=1e-9)
    assert got_leak.sum() < 1.0 - 1e-6


def test_validate_rejects_orphan_edge_endpoints(spark):
    nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (1, 7)], "src long, dst long")
    with pytest.raises(ValueError, match="edge endpoint"):
        linkgraph.pagerank(nodes, edges, iters=2, validate=True)
    # without validation the documented drop semantics apply, no error
    assert linkgraph.pagerank(nodes, edges, iters=2).count() == 3


def test_hub_attracts_rank(spark):
    # star: everyone links to node 0 (and 0 links to 1 to avoid dangling)
    n = 10
    edges = [(i, 0) for i in range(1, n)] + [(0, 1)]
    got = _spark_pagerank(spark, n, edges)
    want = _np_pagerank(n, edges)
    assert np.allclose(got, want, atol=1e-9)
    # the hub and its sole successor (which inherits ALL the hub's mass
    # each round) both dominate the spokes, which hold teleport mass only
    assert got[0] > 5 * got[2] and got[1] > 5 * got[2]
    assert np.allclose(got[2:], 0.15 / n, atol=1e-12)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _np_hits(n, edges, iters=10):
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, t in edges:
            a[t] += h[s]
        a = a / np.sqrt((a * a).sum())
        h = np.zeros(n)
        for s, t in edges:
            h[s] += a[t]
        h = h / np.sqrt((h * h).sum())
    return h, a


def _spark_hits(spark, n, edges, iters=10):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = linkgraph.hits(nodes, edf, iters=iters).collect()
    h, a = np.zeros(n), np.zeros(n)
    for row in out:
        h[row["doc_id"]] = row["hub"]
        a[row["doc_id"]] = row["authority"]
    return h, a


def test_hits_matches_numpy_oracle(spark):
    rng = random.Random(7)
    n = 12
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(40)})
    h, a = _spark_hits(spark, n, edges)
    nh, na = _np_hits(n, edges)
    assert np.allclose(h, nh, atol=1e-6)
    assert np.allclose(a, na, atol=1e-6)


def test_hits_star_graph(spark):
    # every spoke points at the hub node 0: node 0 is the only
    # authority; spokes are the (equal) hubs
    n = 5
    edges = [(i, 0) for i in range(1, n)]
    h, a = _spark_hits(spark, n, edges, iters=3)
    assert a[0] == pytest.approx(1.0, abs=1e-6)
    assert np.allclose(a[1:], 0.0)
    assert h[0] == pytest.approx(0.0, abs=1e-6)
    assert np.allclose(h[1:], 0.5, atol=1e-6)
