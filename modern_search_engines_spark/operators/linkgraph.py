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
reliable ``checkpoint`` on a cluster). Dangling nodes (outdeg 0) leak
their damped mass by construction — the usual simplification; pass
edges with ≥1 out-edge per node (or accept the leak, the relative
ordering is what retrieval blends consume).

Scale notes: the edge table shuffles on src once per iteration and the
rank vector is O(nodes) — both partition cleanly; a skewed in-degree
(one mega-hub dst) is a hash-aggregate hot key that AQE's skew
handling splits. The rank vector is re-derived, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degree(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, outdeg) — distinct-edge out-degree per source node."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 10,
             damping: float = 0.85, node_col: str = "doc_id",
             src: str = "src", dst: str = "dst") -> DataFrame:
    """(node_col, rank) after ``iters`` fixed power-iteration rounds.

    r₀(v) = 1/N;  rₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} rₜ(u)/outdeg(u)

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
    base = float((1.0 - damping) / n)
    ranks = nd.select(F.col(node_col), F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (ed.join(ranks, ed[src] == ranks[node_col])
                   .select(F.col(dst).alias(node_col),
                           (F.col("rank") / F.col("outdeg")).alias("c"))
                   .groupBy(node_col)
                   .agg(F.sum("c").alias("c")))
        ranks = (nd
                 .join(contrib, node_col, "left")
                 .select(F.col(node_col),
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("c"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
