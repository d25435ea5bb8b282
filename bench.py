"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Measures, per BASELINE.md protocol:
  1. full staged index-build throughput (docs/sec) on the deterministic
     synthetic page corpus at TWO parallelism levels — N and 4N cores
     (local[4] vs local[16] at the default 32-vCPU sandbox) — on
     identical input (the sandbox proxy for N vs 4N executors; north
     rule scaling-efficiency evidence). Core sizing: each task slot
     runs a JVM thread + an Arrow python worker (~2 runnable threads
     per slot), so the high level is vCPUs/2 — the machine is exactly
     subscribed, the way a real cluster provisions executor cores for
     Python-UDF stages. Each build runs twice and the min wall is kept
     (the sandbox's gVisor I/O adds multi-second noise spikes);
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
    "bm25_topk", "tfidf_topk", "doc_tf", "term_df_idf",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "embedding_cosine_topk",
    "events_user_topk", "events_sessions", "tpch_pricing_summary",
)


def materialize_pages(n_pages: int, path: str, cpus: int) -> None:
    """Write the synthetic pages table once (untimed): the engine's input
    is a pages TABLE per the north rule — corpus synthesis is not part of
    the measured job."""
    spark = get_spark("bench-gen", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    try:
        (corpus.pages_df(spark, n_pages, seed=42, num_partitions=128)
         .write.mode("overwrite").parquet(path))
    finally:
        spark.stop()


def build_at(parallelism: int, pages_path: str, out_dir: str,
             repeats: int = 2) -> float:
    """Full staged build at the given core count reading the SAME pages
    parquet; returns min wall seconds over ``repeats`` runs (fresh build
    dir each; gVisor noise suppression)."""
    best = float("inf")
    for r in range(repeats):
        spark = get_spark(f"bench-build-{parallelism}-{r}",
                          master=f"local[{parallelism}]",
                          shuffle_partitions=max(8, parallelism * 4))
        try:
            target = out_dir if r == repeats - 1 else f"{out_dir}.warm{r}"
            pages = spark.read.parquet(pages_path)
            t0 = time.time()
            build_persistent_index(spark, pages, target, verbose=False)
            best = min(best, time.time() - t0)
        finally:
            spark.stop()
            time.sleep(3)  # let JVM/page-cache churn settle (gVisor)
            if r != repeats - 1:
                shutil.rmtree(f"{out_dir}.warm{r}", ignore_errors=True)
    return best


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def machine_ceiling(lo: int, hi: int) -> float:
    """Pure-python multiprocessing scaling of this box from lo to hi
    procs — the hardware/sandbox ceiling any job measurement is subject
    to (gVisor + SMT + host contention make 4x threads < 4x throughput
    even for embarrassingly-parallel work)."""
    import multiprocessing as mp
    time.sleep(5)  # let JVM shutdown/page-cache churn settle
    times = {}
    for procs in (lo, hi):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(_burn, [4_000_000] * (hi * 8))
            best = min(best, time.time() - t0)
        times[procs] = best
    return (times[lo] / times[hi]) / (hi / lo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES")
                  or max(400, int(sf * 800_000)))

    t_start = time.time()
    queries: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="mse_bench_")
    try:
        # -- 1. scaling: identical input at N and 4N cores ---------------
        # hi = vCPUs/2 so (JVM + python worker) per slot exactly
        # subscribes the machine; lo = hi/4 for the N->4N comparison.
        hi = max(4, cpus // 2)
        lo = max(1, hi // 4)
        pages_path = os.path.join(work, "pages")
        materialize_pages(n_pages, pages_path, cpus)
        # ABBA order: ambient machine drift (this sandbox has slow
        # phases) hits both levels symmetrically instead of biasing the
        # ratio toward whichever level ran in the quiet block. Fresh
        # build dir per run (a reused dir would resume, not rebuild).
        def run1(par, tag):
            return build_at(par, pages_path,
                            os.path.join(work, f"idx{tag}"), repeats=1)

        t_lo = run1(lo, f"{lo}a")
        t_hi = min(run1(hi, f"{hi}a"), run1(hi, f"{hi}"))
        t_lo = min(t_lo, run1(lo, f"{lo}"))
        for tag in (f"{lo}a", f"{hi}a"):
            shutil.rmtree(os.path.join(work, f"idx{tag}"),
                          ignore_errors=True)
        th_lo, th_hi = n_pages / t_lo, n_pages / t_hi
        eff = (th_hi / th_lo) / (hi / lo) if hi != lo else 1.0
        ceiling = machine_ceiling(lo, hi)
        queries[f"index_build_local{lo}_sec"] = round(t_lo, 3)
        queries[f"index_build_local{hi}_sec"] = round(t_hi, 3)
        queries[f"index_docs_per_sec_local{lo}"] = round(th_lo, 1)
        queries[f"index_docs_per_sec_local{hi}"] = round(th_hi, 1)
        queries["scaling_efficiency"] = round(eff, 3)
        queries["machine_parallel_ceiling"] = round(ceiling, 3)
        queries["scaling_efficiency_vs_ceiling"] = round(
            min(eff / ceiling, 1.0), 3) if ceiling > 0 else 0.0

        # second N->4N datapoint at 1->4 cores: below the sandbox's
        # contention knee (the 4->16 pair is capped by the machine's own
        # ~0.85 ceiling), on a proportionally smaller slice of the SAME
        # pages table.
        if lo > 1:
            # big enough that fixed overheads (~10 s) are noise at
            # local[1] (~100 s), small enough to keep the pair ~2.5 min
            n_small = max(8000, n_pages // 8)
            small_path = os.path.join(work, "pages_small")
            sp = get_spark("bench-slice", master=f"local[{cpus}]")
            try:
                (sp.read.parquet(pages_path).limit(n_small)
                 .repartition(16).write.mode("overwrite")
                 .parquet(small_path))
            finally:
                sp.stop()
            def run1s(par, tag):
                return build_at(par, small_path,
                                os.path.join(work, f"idx{tag}"),
                                repeats=1)

            t1 = run1s(1, "1sa")
            t4 = min(run1s(4, "4sa"), run1s(4, "4s"))
            t1 = min(t1, run1s(1, "1s"))
            eff14 = (t1 / t4) / 4.0
            ceil14 = machine_ceiling(1, 4)
            queries["index_docs_per_sec_local1_small"] = round(
                n_small / t1, 1)
            queries["index_docs_per_sec_local4_small"] = round(
                n_small / t4, 1)
            queries["scaling_efficiency_1_4"] = round(eff14, 3)
            queries["machine_parallel_ceiling_1_4"] = round(ceil14, 3)
            queries["scaling_efficiency_1_4_vs_ceiling"] = round(
                min(eff14 / ceil14, 1.0), 3) if ceil14 > 0 else 0.0

        # third datapoint: the SAME 4->16 pair on a 2x corpus. Fixed
        # per-build costs (7 stage-job scheduling floors, commits) are
        # the Amdahl term that caps the small-corpus ratio; they
        # amortize as the corpus grows — the trend toward the cluster
        # regime (hours-long stages, fixed seconds invisible). One run
        # per level (trend evidence, not a headline number).
        big_path = os.path.join(work, "pages_big")
        n_big = n_pages * 2
        spb = get_spark("bench-big", master=f"local[{cpus}]")
        try:
            (corpus.pages_df(spb, n_big, seed=43, num_partitions=256)
             .write.mode("overwrite").parquet(big_path))
        finally:
            spb.stop()
        t_hi_big = build_at(hi, big_path, os.path.join(work, "idxbh"),
                            repeats=1)
        t_lo_big = build_at(lo, big_path, os.path.join(work, "idxbl"),
                            repeats=1)
        eff_big = (t_lo_big / t_hi_big) / (hi / lo)
        queries[f"index_docs_per_sec_local{lo}_2x_corpus"] = round(
            n_big / t_lo_big, 1)
        queries[f"index_docs_per_sec_local{hi}_2x_corpus"] = round(
            n_big / t_hi_big, 1)
        queries["scaling_efficiency_2x_corpus"] = round(eff_big, 3)
        for tag in ("idxbh", "idxbl"):
            shutil.rmtree(os.path.join(work, tag), ignore_errors=True)
        shutil.rmtree(big_path, ignore_errors=True)

        # -- 2. query latency over the built index -----------------------
        spark = get_spark("bench-query", master=f"local[{hi}]",
                          shuffle_partitions=max(8, hi * 2))
        from modern_search_engines_spark.plans.build import load_index
        idx = load_index(spark, os.path.join(work, f"idx{hi}"))
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

        # hot serving path (plans/hot.py): same index, same WAND, no
        # Spark job per query — the interactive-latency tier
        from modern_search_engines_spark.plans.hot import HotSearcher
        hot = HotSearcher(os.path.join(work, f"idx{hi}"))
        hot.search(BENCH_QUERIES[0][1], top_k=100)  # warm caches
        hot_lats = []
        for _, qtext in BENCH_QUERIES:
            t0 = time.time()
            hot.search(qtext, top_k=100)
            hot_lats.append(time.time() - t0)
        hot_lats.sort()
        queries["wand_hot_p50_sec"] = round(
            statistics.median(hot_lats), 4)
        queries["wand_hot_p95_sec"] = round(
            hot_lats[max(0, int(len(hot_lats) * 0.95) - 1)], 4)

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
                  f"({n_pages} synthetic pages; N->4N cores scaling)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }))


if __name__ == "__main__":
    sys.exit(main())
