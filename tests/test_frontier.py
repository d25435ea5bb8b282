"""Planted-case tests for the crawl-frontier family (SURVEY S3/S4/P15/
U4 batch re-expressions — operators/frontier.py). Reference semantics
under test: min-depth BFS discovery with cycle termination, the
86,400 s re-crawl freshness predicate (Crawler.py:50, boundary
INCLUSIVE on the due side — the reference skips strictly-less-than),
domain purge, per-domain growth cap, and robots crawl-delay politeness
with the no-state-row-yet fast path."""

from pyspark.sql import functions as F

from modern_search_engines_spark.operators import frontier


def _bfs_map(spark, edges, seeds, depth):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "url bigint")
    out = frontier.bfs_discover(s, e, depth)
    return {r["url"]: r["depth"] for r in out.collect()}


def test_bfs_min_depth_and_cycle_termination(spark):
    # 1 -> 2 -> 3 -> 1 (cycle), 2 -> 4, 9 isolated; 5 -> 3 shortcut
    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (5, 3)]
    got = _bfs_map(spark, edges, [1, 5], depth=5)
    # 3 is reachable at depth 1 via 5 even though the 1-path gives 2
    assert got == {1: 0, 5: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_respects_max_depth_and_unreachable(spark):
    edges = [(1, 2), (2, 3), (3, 4), (7, 8)]
    got = _bfs_map(spark, edges, [1], depth=2)
    assert got == {1: 0, 2: 1, 3: 2}  # 4 beyond depth, 7/8 unreachable


def test_bfs_early_exit_on_exhaustion(spark):
    got = _bfs_map(spark, [(1, 2)], [1], depth=50)
    assert got == {1: 0, 2: 1}


def test_cap_per_domain(spark):
    rows = [(d, u, dep) for d in (0, 1) for dep, u in
            enumerate([10 * d + k for k in range(5)])]
    df = spark.createDataFrame(rows, "domain bigint, url bigint, depth int")
    out = frontier.cap_per_domain(df, cap=2, order_cols=("depth", "url"))
    got = sorted((r["domain"], r["url"]) for r in out.collect())
    assert got == [(0, 0), (0, 1), (1, 10), (1, 11)]


def test_recrawl_due_boundary_inclusive(spark):
    # reference SKIPS when elapsed < 86400 (Crawler.py:269-275), so an
    # exactly-86400s-old doc IS due
    meta = spark.createDataFrame(
        [(1, 100_000 - 86_400), (2, 100_000 - 86_399), (3, 0)],
        "url bigint, last_crawled bigint")
    due = frontier.recrawl_due(meta, now_ts=100_000)
    assert sorted(r["url"] for r in due.collect()) == [1, 3]


def test_purge_domains(spark):
    fr = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c")], "url bigint, domain string")
    purged = spark.createDataFrame([("a",), ("c",)], "domain string")
    kept = frontier.purge_domains(fr, purged)
    assert sorted(r["url"] for r in kept.collect()) == [2]


def test_politeness_schedule(spark):
    fr = spark.createDataFrame(
        # (url, domain, priority)
        [(1, "slow", 5), (2, "slow", 1), (3, "ready", 9), (4, "ready", 2),
         (5, "ready", 7), (6, "fresh", 1), (7, "default_hit", 1),
         (8, "default_ok", 1)],
        "url bigint, domain string, priority bigint")
    state = spark.createDataFrame(
        # (domain, last_crawl, crawl_delay) — NOW=1000
        [("slow", 990, 60),         # 10s elapsed < 60 -> blocked
         ("ready", 900, 60),        # 100 >= 60 -> eligible
         ("default_hit", 995, None),   # null delay -> default 30; 5 < 30
         ("default_ok", 960, None)],   # 40 >= 30 -> eligible
        "domain string, last_crawl bigint, crawl_delay bigint")
    # "fresh" has NO state row -> immediately eligible (first contact)
    out = frontier.politeness_schedule(
        fr, state, now_ts=1000, default_delay_s=30, batch_per_domain=2,
        order_cols=("priority", "url"))
    got = sorted((r["domain"], r["url"]) for r in out.collect())
    # ready emits its best-2 by priority: url 4 (p2), url 5 (p7)
    assert got == [("default_ok", 8), ("fresh", 6), ("ready", 4),
                   ("ready", 5)]


def test_politeness_is_single_domain_join(spark):
    # the scheduler's plan must not carry a cartesian/nested-loop —
    # domain dim joins by key and the window is per-domain
    fr = spark.createDataFrame([(1, "a", 1)],
                               "url bigint, domain string, priority bigint")
    st = spark.createDataFrame([("a", 0, 1)],
                               "domain string, last_crawl bigint, "
                               "crawl_delay bigint")
    plan = frontier.politeness_schedule(
        fr, st, 100, 10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
