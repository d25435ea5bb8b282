"""Scale curve for the crawl-frontier family: BFS discovery + schedule
at 10x-stepped graph sizes, same shape as scale_curve_curation.py.

Synthetic graph: n nodes, 3 deterministic out-edges each (the contract
generator's recurrence), seeds = every 1000th node, depth 4 — so the
BFS round count, join structure, and per-round anti-join are identical
across sizes and only the data volume changes. A sublinear
seconds-ratio per 10x-step is the pass condition (each BFS round is
one edge join + one seen anti-join; nothing should go quadratic).

Usage: python scripts/scale_frontier.py [--sizes 100000,1000000]
Prints one JSON line with per-size seconds and discovered counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

A, B = 48271, 16807  # contract.py's PR_EDGE_A/B recurrence


def run_one(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import frontier

    nodes = spark.range(n).select(F.col("id").alias("url"))
    edges = (nodes.select(
        F.col("url").alias("src"),
        F.explode(F.array(*[F.lit(k) for k in (1, 2, 3)])).alias("k"))
        .select("src", ((F.col("src") * F.lit(A) + F.col("k") * F.lit(B))
                        % F.lit(n)).alias("dst")))
    seeds = nodes.filter(F.col("url") % 1000 == 0)
    # materialize inputs untimed (the operator's cost, not range codegen)
    edges = edges.localCheckpoint(eager=True)
    seeds = seeds.localCheckpoint(eager=True)

    t0 = time.time()
    reach = frontier.bfs_discover(seeds, edges, max_depth=4)
    capped = frontier.cap_per_domain(
        reach.withColumn("domain", F.col("url") % F.lit(1024)),
        cap=150, order_cols=("depth", "url"))
    n_capped = capped.count()
    bfs_sec = round(time.time() - t0, 2)
    return {"n_nodes": n, "n_discovered": reach.count(),
            "n_capped": n_capped, "bfs_sec": bfs_sec}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]

    from modern_search_engines_spark.session import get_spark
    spark = get_spark("frontier-scale", master="local[16]",
                      shuffle_partitions=32)
    try:
        rows = [run_one(spark, n) for n in sizes]
    finally:
        spark.stop()
    out = {"curve": rows}
    for a, b in zip(rows, rows[1:]):
        out[f"ratio_{a['n_nodes']}_{b['n_nodes']}"] = round(
            b["bfs_sec"] / a["bfs_sec"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
