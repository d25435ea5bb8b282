"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Measures, per BASELINE.md protocol:
  1. full staged index-build throughput (docs/sec) on the deterministic
     synthetic page corpus at TWO parallelism levels — local[8] and
     local[$SPARK_GRAFT_CPUS] — on identical input (the sandbox proxy for
     N vs 4N executors; north rule scaling-efficiency evidence);
  2. per-query BM25 latency (block-max WAND over compressed postings,
     bucket-pruned scan) → p50/p95 over the reference-style query set;
  3. the driver-contract queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec ... + throughput/efficiency keys}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from modern_search_engines_spark import contract, corpus
from modern_search_engines_spark.operators import wand
from modern_search_engines_spark.plans.build import build_persistent_index
from modern_search_engines_spark.session import get_spark

BENCH_QUERIES = [
    ("q01", "castle museum"), ("q02", "hotels in tuebingen"),
    ("q03", "university research lecture"), ("q04", "river boat tour"),
    ("q05", "food restaurant review"), ("q06", "old town market"),
    ("q07", "music festival garden"), ("q08", "library science course"),
    ("q09", "travel guide map"), ("q10", "church history wall"),
    ("q11", "student campus semester"), ("q12", "bridge neckar walk"),
    ("q13", "art gallery theater"), ("q14", "wine beer cheese"),
    ("q15", "hiking trail summit"), ("q16", "professor exam course"),
    ("q17", "cafe bakery menu"), ("q18", "tübingen"),
    ("q19", "ancient tower gate"), ("q20", "quiet park view"),
]

CONTRACT_BENCH = (
    "bm25_topk", "doc_tf", "term_df_idf", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "embedding_cosine_topk", "events_user_topk",
    "tpch_pricing_summary",
)


def build_at(parallelism: int, n_pages: int, out_dir: str) -> float:
    """Full staged build at the given core count; returns wall seconds."""
    spark = get_spark(f"bench-build-{parallelism}",
                      master=f"local[{parallelism}]",
                      shuffle_partitions=max(8, parallelism * 2))
    try:
        pages = corpus.pages_df(spark, n_pages, seed=42,
                                num_partitions=parallelism * 2)
        t0 = time.time()
        build_persistent_index(spark, pages, out_dir, verbose=False)
        return time.time() - t0
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(400, int(sf * 400_000))

    t_start = time.time()
    queries: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="mse_bench_")
    try:
        # -- 1. scaling: identical input at 8 and $CPUS cores ------------
        lo = 8
        t_lo = build_at(lo, n_pages, os.path.join(work, f"idx{lo}"))
        t_hi = build_at(cpus, n_pages, os.path.join(work, f"idx{cpus}"))
        th_lo, th_hi = n_pages / t_lo, n_pages / t_hi
        eff = (th_hi / th_lo) / (cpus / lo) if cpus != lo else 1.0
        queries[f"index_build_local{lo}_sec"] = round(t_lo, 3)
        queries[f"index_build_local{cpus}_sec"] = round(t_hi, 3)
        queries[f"index_docs_per_sec_local{lo}"] = round(th_lo, 1)
        queries[f"index_docs_per_sec_local{cpus}"] = round(th_hi, 1)
        queries["scaling_efficiency"] = round(eff, 3)

        # -- 2. query latency over the built index -----------------------
        spark = get_spark("bench-query", master=f"local[{cpus}]",
                          shuffle_partitions=max(8, cpus))
        from modern_search_engines_spark.plans.build import load_index
        idx = load_index(spark, os.path.join(work, f"idx{cpus}"))
        comp = idx["postings_compressed"]
        dim = idx["doc_dim"]
        # warm-up (JVM/codegen)
        wand.run_wand(spark, BENCH_QUERIES[:1], comp, dim, k=100).collect()
        lats = []
        for qid, qtext in BENCH_QUERIES:
            t0 = time.time()
            wand.run_wand(spark, [(qid, qtext)], comp, dim,
                          k=100).collect()
            lats.append(time.time() - t0)
        lats.sort()
        queries["wand_query_p50_sec"] = round(statistics.median(lats), 4)
        queries["wand_query_p95_sec"] = round(
            lats[max(0, int(len(lats) * 0.95) - 1)], 4)
        t0 = time.time()
        wand.run_wand(spark, BENCH_QUERIES, comp, dim, k=100).collect()
        queries["wand_batch_20q_sec"] = round(time.time() - t0, 4)

        # -- 3. driver-contract queries at the sf dir --------------------
        for name in CONTRACT_BENCH:
            fn = contract.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).collect()
            queries[name] = round(time.time() - t0, 4)
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = time.time() - t_start
    print(json.dumps({
        "metric": "index_build+bm25_query bench "
                  f"({n_pages} synthetic pages; scaling local[8]->local[{cpus}])",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }))


if __name__ == "__main__":
    sys.exit(main())
