"""Link-graph analytics — PageRank over a (src, dst) edge table.

A web-scale search engine ranks with link signals next to BM25; the
reference's crawler already harvests the link structure
(/root/reference/backend/core/Document.py:98-113 collects hrefs per
page; the reference itself never uses them for ranking — this operator
is the scale-side extension of that data).

Execution shape: classic distributed power iteration. Each of the
fixed ``iters`` rounds is ONE shuffle — contributions r/outdeg flow
along edges (hash join on src), are summed per dst (hash aggregate),
and re-anchor on the full node set with a left join (nodes with no
in-links keep the teleport mass). No global sort, no driver-side
graph, no per-row Python. Per-round ``localCheckpoint`` truncates the
iterative lineage exactly as ``dedup.connected_components`` does (use
reliable ``checkpoint`` on a cluster).

Dangling nodes (outdeg 0): by default their damped mass leaks each
round (the usual simplification — fine for the relative ordering a
retrieval blend consumes). ``redistribute_dangling=True`` adds the
standard correction: the total rank sitting on outdeg-0 nodes is
aggregated per round (a 1-row job) and redistributed uniformly, so
ranks sum to 1 and absolute values match the textbook recurrence.

Input contract: every edge endpoint (src AND dst) must appear in
``nodes`` — contributions of unknown-src edges are silently dropped by
the inner join and unknown-dst contributions are discarded by the
re-anchor join, skewing ranks with no error. ``validate=True`` asserts
the contract with two anti-join counts before iterating (debug tool —
two extra jobs over the edge set).

Scale notes: the edge table shuffles on src once per iteration and the
rank vector is O(nodes) — both partition cleanly; a skewed in-degree
(one mega-hub dst) is a hash-aggregate hot key whose partial (map-side)
aggregation absorbs the fan-in. The rank vector is re-derived, never
collected; the dangling-mass aggregate is the only per-round driver
value (one float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degree(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, outdeg) — distinct-edge out-degree per source node."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 10,
             damping: float = 0.85, node_col: str = "doc_id",
             src: str = "src", dst: str = "dst",
             redistribute_dangling: bool = False,
             validate: bool = False) -> DataFrame:
    """(node_col, rank) after ``iters`` fixed power-iteration rounds.

    r₀(v) = 1/N;  rₜ₊₁(v) = (1−d)/N + d·(Σ_{u→v} rₜ(u)/outdeg(u)
                                          [+ D_t/N if redistributing])
    where D_t is the round's total rank on outdeg-0 nodes.

    ``edges`` should be distinct (src, dst) pairs; self-loops are legal
    (they are just edges in the recurrence). Fixed iteration count —
    not a convergence test — so the result is a deterministic function
    of the graph, replayable by any engine (the contract twin unrolls
    the same recurrence in SQL).
    """
    # both loop-invariant inputs are checkpointed ONCE: without this the
    # re-anchor join would re-evaluate the caller's node plan (e.g. a
    # parquet scan) on every round, and the edge join its whole lineage
    nd = nodes.select(node_col).localCheckpoint(eager=True)
    n = nd.count()
    deg = out_degree(edges, src)
    ed = (edges.join(deg, src)
          .select(F.col(src), F.col(dst), F.col("outdeg"))
          .localCheckpoint(eager=True))
    if validate:
        ends = (edges.select(F.col(src).alias(node_col))
                .union(edges.select(F.col(dst).alias(node_col))))
        orphans = ends.join(nd, node_col, "left_anti").count()
        if orphans:
            raise ValueError(
                f"{orphans} edge endpoint rows missing from nodes — "
                "their rank mass would be silently dropped")
    base = float((1.0 - damping) / n)
    ranks = nd.select(F.col(node_col), F.lit(1.0 / n).alias("rank"))
    # dangling set is loop-invariant: nodes with no out-edge
    dangling = (nd.join(ed.select(F.col(src).alias(node_col)).distinct(),
                        node_col, "left_anti")
                .localCheckpoint(eager=True)
                if redistribute_dangling else None)
    for _ in range(iters):
        extra = 0.0
        if dangling is not None:
            # one scalar per round: total rank stuck on outdeg-0 nodes
            d_mass = (ranks.join(dangling, node_col)
                      .agg(F.sum("rank")).collect()[0][0]) or 0.0
            extra = float(damping * d_mass / n)
        contrib = (ed.join(ranks, ed[src] == ranks[node_col])
                   .select(F.col(dst).alias(node_col),
                           (F.col("rank") / F.col("outdeg")).alias("c"))
                   .groupBy(node_col)
                   .agg(F.sum("c").alias("c")))
        ranks = (nd
                 .join(contrib, node_col, "left")
                 .select(F.col(node_col),
                         (F.lit(base) + F.lit(extra) + F.lit(damping)
                          * F.coalesce(F.col("c"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def hits(nodes: DataFrame, edges: DataFrame, iters: int = 10,
         node_col: str = "doc_id", src: str = "src",
         dst: str = "dst") -> DataFrame:
    """(node_col, hub, authority) — Kleinberg's HITS after ``iters``
    fixed mutual-reinforcement rounds, L2-normalized each round:

      aₜ(v) = Σ_{u→v} hₜ₋₁(u) / ‖·‖₂ ;  hₜ(u) = Σ_{u→v} aₜ(v) / ‖·‖₂

    The page-quality counterpart to ``pagerank`` (good HUBS link to
    good AUTHORITIES — the other classic link signal a ranker blends).
    Fixed iteration count, h₀ = 1/√N, so the result is a deterministic
    function of the graph (the contract twin unrolls the identical
    recurrence; ``edges`` should be distinct pairs).

    Scale shape mirrors ``pagerank``: per round, one keyed join +
    map-side-combinable sum per direction, ONE bounded scalar aggregate
    per normalization, per-round ``localCheckpoint`` lineage
    truncation; the hub/authority vectors are never collected.
    """
    import math

    nd = nodes.select(node_col).localCheckpoint(eager=True)
    n = nd.count()
    ed = edges.select(src, dst).localCheckpoint(eager=True)
    hubs = nd.select(F.col(node_col),
                     F.lit(1.0 / math.sqrt(n)).alias("hub"))
    auth = None
    for _ in range(iters):
        a_raw = (ed.join(hubs, ed[src] == hubs[node_col])
                 .groupBy(F.col(dst).alias(node_col))
                 .agg(F.sum("hub").alias("a")))
        a_all = (nd.join(a_raw, node_col, "left")
                 .select(F.col(node_col),
                         F.coalesce("a", F.lit(0.0)).alias("a"))
                 .localCheckpoint(eager=True))
        a_norm = math.sqrt(
            a_all.agg(F.sum(F.col("a") * F.col("a"))).collect()[0][0])
        auth = a_all.select(
            node_col, (F.col("a") / F.lit(a_norm)).alias("authority"))
        h_raw = (ed.join(auth, ed[dst] == auth[node_col])
                 .groupBy(F.col(src).alias(node_col))
                 .agg(F.sum("authority").alias("h")))
        h_all = (nd.join(h_raw, node_col, "left")
                 .select(F.col(node_col),
                         F.coalesce("h", F.lit(0.0)).alias("h"))
                 .localCheckpoint(eager=True))
        h_norm = math.sqrt(
            h_all.agg(F.sum(F.col("h") * F.col("h"))).collect()[0][0])
        hubs = h_all.select(
            node_col, (F.col("h") / F.lit(h_norm)).alias("hub"))
    return hubs.join(auth, node_col).select(
        node_col, F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"))
