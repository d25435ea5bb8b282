"""jobs/discover_frontier.py: end-to-end in a subprocess (own Spark
session: seeds file → BFS discovery stage with per-domain cap + purge
→ politeness batch stage), checked against a hand-computed closure."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_inputs(spark, tmp_path):
    # a.com hosts a 3-page chain; b.com one page; c.com (purged) one
    links = [
        ("http://a.com/1", "http://a.com/2"),
        ("http://a.com/2", "http://a.com/3"),
        ("http://a.com/2", "http://b.com/1"),
        ("http://b.com/1", "http://c.com/1"),
        ("http://a.com/3", "http://a.com/1"),   # cycle
        ("http://far.com/1", "http://far.com/2"),  # unreachable island
    ]
    links_p = str(tmp_path / "links")
    spark.createDataFrame(links, "src string, dst string") \
        .write.mode("overwrite").parquet(links_p)
    seeds_p = str(tmp_path / "seeds.txt")
    with open(seeds_p, "w") as f:
        f.write("# comment line\nhttp://a.com/1\n\n")
    state_p = str(tmp_path / "state")
    spark.createDataFrame(
        # a.com delay elapsed; b.com blocked (5 < 60)
        [("a.com", 900, 60), ("b.com", 995, 60)],
        "domain string, last_crawl bigint, crawl_delay bigint") \
        .write.mode("overwrite").parquet(state_p)
    return links_p, seeds_p, state_p


def test_discover_frontier_job_end_to_end(spark, tmp_path):
    links_p, seeds_p, state_p = _write_inputs(spark, tmp_path)
    out = str(tmp_path / "frontier")
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "discover_frontier.py"),
         "--links", links_p, "--seeds", seeds_p, "--out", out,
         "--max-depth", "3", "--domain-cap", "2",
         "--purge-domains", "c.com",
         "--state", state_p, "--now", "1000",
         "--batch-per-domain", "1"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_seeds"] == 1

    disc = {r["url"]: (r["domain"], r["depth"]) for r in
            spark.read.parquet(os.path.join(out, "discovered")).collect()}
    # closure from a.com/1 within 3 hops: a1(0) a2(1) a3(2)+b1(2) c1(3);
    # domain cap 2 drops a3 (depth tie broken by url: a1, a2 kept);
    # purge drops c.com; far.com island never reached
    assert disc == {"http://a.com/1": ("a.com", 0),
                    "http://a.com/2": ("a.com", 1),
                    "http://b.com/1": ("b.com", 2)}

    batch = {r["url"] for r in
             spark.read.parquet(os.path.join(out, "batch")).collect()}
    # politeness: a.com eligible (100 >= 60) -> best-priority url a1;
    # b.com blocked (5 < 60)
    assert batch == {"http://a.com/1"}
