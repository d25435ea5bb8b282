"""Crawl-frontier dataflow re-expressed as batch table operators.

The reference's crawler keeps its frontier/politeness state in driver
memory: a ``collections.deque`` work queue seeded from a text file
(/root/reference/backend/core/Crawler.py:72-85, pop at :259-260), a
per-domain robots.txt politeness map with crawl-delay/req-rate
(:183-202), a re-crawl freshness predicate ``time_since_last_crawl <
86400`` (:50, :269-275), a 150-crawls-per-domain growth cap (:51,
:204-207), and a purge that drops every frontier URL of a domain gone
irrelevant (:222-224, triggered after 50 consecutive irrelevant crawls,
:52). SURVEY §2 carries these as S4, S3, P15, and U4.

None of that survives 10¹² URLs in one process — but every piece IS a
table operation, which is how production crawl schedulers (and batch
link-discovery jobs over Common Crawl) are actually built. This module
is the scale-side re-expression (NOT a copy — the reference is
imperative deque/dict mutation; this is declarative DataFrame algebra):

  frontier       ≡ table (url, domain, depth/priority, …)
  deque discovery≡ iterative edge-join + anti-join on seen (BFS rounds)
  visited check  ≡ left_anti against the seen table
  freshness gate ≡ filter(now − last_crawled ≥ threshold)
  politeness     ≡ join to a per-domain state dim, delay predicate,
                   pick ≤ batch URLs per eligible domain
  domain purge   ≡ left_anti on the purged-domain set
  per-domain cap ≡ bounded rank within domain

Scale shape: each BFS round is one equi-join on ``src`` plus one
anti-join on the seen set (both hash-partitioned on url — the same
discipline as ``dedup.connected_components``), with per-round
``localCheckpoint`` lineage truncation; the seen set is a DataFrame,
never a driver-side set. The politeness join keys on domain — a dim
table orders of magnitude smaller than the frontier (broadcast-able
when it fits; AQE otherwise). The per-domain cap/batch windows
partition by domain: bounded output per key, and a pathological
mega-domain is exactly what the cap exists to bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def domain_expr(url_col: str = "url") -> Column:
    """JVM-side domain of a URL: host minus a leading ``www.`` — the
    same normalization as ``operators/indexing.domain_stats`` and the
    reference's ``Document.get_domain`` (Document.py, urlparse netloc
    with 'www.' stripped)."""
    return F.regexp_replace(F.parse_url(F.col(url_col), F.lit("HOST")),
                            r"^www\.", "")


def bfs_discover(seeds: DataFrame, edges: DataFrame, max_depth: int,
                 node_col: str = "url", src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """(node_col, depth) — every node reachable from ``seeds`` within
    ``max_depth`` hops, at its MINIMUM depth.

    Batch re-expression of the reference's frontier loop
    (Crawler.py:259-260 pop → :204-207 push links): level-synchronous
    BFS. Because each round anti-joins the seen set before extending,
    a node is recorded the first time it is reached — which IS its
    minimum depth — and cycles terminate for free. ``max_depth`` rounds
    exactly; deterministic function of (seeds, edges), replayable by a
    recursive-CTE twin.
    """
    seen = (seeds.select(F.col(node_col), F.lit(0).alias("depth"))
            .distinct().localCheckpoint(eager=True))
    ed = edges.select(src, dst).localCheckpoint(eager=True)
    layer = seen
    for d in range(1, max_depth + 1):
        nxt = (ed.join(layer, ed[src] == layer[node_col])
               .select(F.col(dst).alias(node_col))
               .distinct()
               .join(seen, node_col, "left_anti")
               .select(F.col(node_col), F.lit(d).alias("depth"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        seen = seen.union(nxt).localCheckpoint(eager=True)
        layer = nxt
    return seen


def cap_per_domain(frontier: DataFrame, cap: int,
                   domain_col: str = "domain",
                   order_cols: tuple[str, ...] = ("depth", "url"),
                   ) -> DataFrame:
    """Keep at most ``cap`` rows per domain, by ``order_cols``.

    The reference stops ADDING a domain's links after 150 crawls
    (SAME_SITE_THRESHOLD, Crawler.py:51, enforced at :204-207) — an
    arrival-order cap. Batch semantics must be order-free, so the cap
    here is deterministic: best ``cap`` rows per domain by
    ``order_cols`` (shallowest depth first = the pages an
    arrival-ordered BFS crawl reaches first). Window partitions by
    domain — output bounded to ``cap`` rows/key; the window sort over a
    mega-domain's candidates is the one hot spot, and it is exactly the
    skew this cap exists to cut off downstream.
    """
    w = Window.partitionBy(domain_col).orderBy(
        *[F.col(c) for c in order_cols])
    return (frontier.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def recrawl_due(doc_metadata: DataFrame, now_ts: int,
                threshold_s: int = 86400,
                ts_col: str = "last_crawled") -> DataFrame:
    """Rows of ``doc_metadata`` due for a re-fetch.

    The reference skips a URL when ``time_since_last_crawl <
    DOC_UPDATE_THRESHOLD`` (86,400 s — Crawler.py:50, :269-275); this
    is the complement as a map-only filter (partition-prunable when the
    metadata table is date-partitioned).
    """
    return doc_metadata.filter(
        (F.lit(now_ts) - F.col(ts_col)) >= F.lit(threshold_s))


def purge_domains(frontier: DataFrame, purged: DataFrame,
                  domain_col: str = "domain") -> DataFrame:
    """Drop every frontier row whose domain appears in ``purged``.

    Reference: ``__remove_domain_from_frontier`` (Crawler.py:222-224) —
    an O(frontier) driver-side list scan per purge; here one anti-join
    on domain (broadcast-able: the purged set is tiny by construction —
    domains gone irrelevant, :52).
    """
    return frontier.join(purged.select(domain_col).distinct(),
                         domain_col, "left_anti")


def politeness_schedule(frontier: DataFrame, domain_state: DataFrame,
                        now_ts: int, default_delay_s: int,
                        batch_per_domain: int = 1,
                        domain_col: str = "domain",
                        order_cols: tuple[str, ...] = ("priority", "url"),
                        ) -> DataFrame:
    """The next crawl batch: ≤ ``batch_per_domain`` URLs from each
    domain whose robots crawl-delay has elapsed.

    Reference semantics, one URL at a time: ``__is_allowed_to_crawl``
    consults the per-domain robots state (crawl_delay, last_crawl —
    Crawler.py:183-202) before fetching. Batch re-expression: join the
    frontier to the domain-state dim, keep domains where ``now −
    last_crawl ≥ coalesce(crawl_delay, default)`` (a domain with no
    state row yet is immediately eligible — the reference fetches
    robots.txt on first contact), then take the best ``order_cols``
    rows per eligible domain. One join keyed on domain + one bounded
    window; the emitted batch is ≤ batch_per_domain × |domains|.
    """
    st = domain_state.select(
        F.col(domain_col),
        F.col("last_crawl").alias("_last"),
        F.col("crawl_delay").alias("_delay"))
    eligible = (frontier.join(st, domain_col, "left")
                .filter((F.col("_last").isNull())
                        | ((F.lit(now_ts) - F.col("_last"))
                           >= F.coalesce(F.col("_delay"),
                                         F.lit(default_delay_s))))
                .drop("_last", "_delay"))
    w = Window.partitionBy(domain_col).orderBy(
        *[F.col(c) for c in order_cols])
    return (eligible.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= batch_per_domain).drop("_rn"))
