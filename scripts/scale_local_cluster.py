"""North-rule scaling measured with REAL separate executor JVMs.

The rule asks for ">= 0.8 throughput scaling efficiency from N to 4N
executors, run via spark-submit --py-files on a multi-executor
cluster". This sandbox has no cluster, but Spark's `local-cluster[
n, cores, mem]` test master launches n genuine standalone Worker +
CoarseGrainedExecutorBackend JVM processes on one box — disjoint
heaps, per-executor python workers, real RPC shuffle paths — i.e.
the exact multi-executor shape, minus the network. That removes the
single-shared-JVM GC artifact that BASELINE.md's >16-core probe
measured (one ParallelGC heap collecting for 32 allocator threads),
so this is the most cluster-faithful N-vs-4N evidence the sandbox
can produce:

    spark-submit --master local-cluster[1,4,M] --py-files mse.zip \
        jobs/build_index.py ...     # N  = 1 executor  x 4 cores
    spark-submit --master local-cluster[4,4,M] --py-files mse.zip \
        jobs/build_index.py ...     # 4N = 4 executors x 4 cores

Protocol mirrors bench.py's headline: identical input parquet (written
once, untimed, page-cache warmed), identical job config at both levels
(only executor COUNT differs), strictly alternating lo/hi pairs spread
across the run, floor (min) per level — this box has multi-minute
slow phases that a back-to-back block would alias into the ratio.
Each job runs --warm so fresh executor JVMs amortize JIT outside the
build clock, like long-lived cluster executors do. build_seconds
comes from the job's own JSON line (excludes session/JVM startup:
cluster provisioning is not part of the measured dataflow).

Usage: python scripts/scale_local_cluster.py [--n-pages 80000]
       [--pairs 3] [--execs-lo 1] [--execs-hi 4] [--cores 4]
       [--exec-mem-mb 6144] [--work DIR]
Prints one JSON line with per-level floors, throughputs, raw
efficiency, and all samples.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def make_zip(work: str) -> str:
    pyz = os.path.join(work, "mse.zip")
    pkg = os.path.join(REPO, "modern_search_engines_spark")
    with zipfile.ZipFile(pyz, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".properties")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return pyz


def materialize(n_pages: int, path: str) -> None:
    from modern_search_engines_spark import corpus
    from modern_search_engines_spark.session import get_spark
    spark = get_spark("lc-gen", master="local[32]", shuffle_partitions=64)
    try:
        (corpus.pages_df(spark, n_pages, seed=42, num_partitions=128)
         .write.mode("overwrite").parquet(path))
        # untimed page-cache warm read (first read of freshly written
        # parquet pays ~2x cold-I/O on this sandbox — bench.py proto §1)
        spark.read.parquet(path).write.format("noop").mode("overwrite") \
            .save()
    finally:
        spark.stop()


def run_build(n_execs: int, cores: int, mem_mb: int, pyz: str,
              pages: str, out: str, timeout_s: int = 1800) -> float:
    """One spark-submit build on a fresh local-cluster; returns the
    job-reported build_seconds."""
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ)
    # tmpfs shuffle scratch for Worker/executor processes too (get_spark
    # only sets it inside the driver process, after the JVMs it matters
    # for have already launched)
    if "SPARK_LOCAL_DIRS" not in env and os.path.isdir("/dev/shm"):
        scratch = "/dev/shm/spark-graft-local"
        os.makedirs(scratch, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = scratch
    cmd = [
        "spark-submit",
        "--master", f"local-cluster[{n_execs},{cores},{mem_mb}]",
        "--driver-memory", "8g",
        "--conf", f"spark.executor.memory={mem_mb - 1024}m",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.ui.enabled=false",
        "--py-files", pyz,
        os.path.join(REPO, "jobs", "build_index.py"),
        "--pages", pages, "--out", out, "--warm",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=timeout_s, env=env, cwd=REPO)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise RuntimeError(f"build at {n_execs} execs failed rc={p.returncode}")
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["build_seconds"])


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=80_000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--execs-lo", type=int, default=1)
    ap.add_argument("--execs-hi", type=int, default=4)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--exec-mem-mb", type=int, default=6144)
    ap.add_argument("--work", default="/tmp/mse_lc_scale")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.work, exist_ok=True)
    pyz = make_zip(args.work)
    pages = os.path.join(args.work, f"pages{args.n_pages}")
    if not os.path.exists(os.path.join(pages, "_SUCCESS")):
        materialize(args.n_pages, pages)

    samples: dict[str, list[float]] = {"lo": [], "hi": []}
    for tag in "abcdefgh"[: args.pairs]:
        for lvl, n in (("lo", args.execs_lo), ("hi", args.execs_hi)):
            out = os.path.join(args.work, f"idx_{lvl}_{tag}")
            t = run_build(n, args.cores, args.exec_mem_mb, pyz, pages, out)
            samples[lvl].append(round(t, 1))
            print(f"[pair {tag}] {lvl} ({n} execs x {args.cores} cores): "
                  f"{t:.1f}s", file=sys.stderr)
            if not args.keep:
                shutil.rmtree(out, ignore_errors=True)
            time.sleep(3)
    t_lo, t_hi = min(samples["lo"]), min(samples["hi"])
    ratio = args.execs_hi / args.execs_lo
    thr_lo = args.n_pages / t_lo
    thr_hi = args.n_pages / t_hi
    eff = (thr_hi / thr_lo) / ratio
    print(json.dumps({
        "n_pages": args.n_pages,
        "lo": {"executors": args.execs_lo, "cores_each": args.cores,
               "floor_sec": t_lo, "docs_per_sec": round(thr_lo, 1)},
        "hi": {"executors": args.execs_hi, "cores_each": args.cores,
               "floor_sec": t_hi, "docs_per_sec": round(thr_hi, 1)},
        "scaling_efficiency_multi_jvm": round(eff, 3),
        "samples": samples,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
