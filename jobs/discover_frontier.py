"""spark-submit entry point: batch crawl-frontier discovery + next
crawl batch — the reference crawler's frontier loop (Crawler.py:
deque + crawl_state.pickle) as a resumable table job.

    spark-submit --py-files mse.zip jobs/discover_frontier.py \
        --links /data/links.parquet --seeds start_frontier.txt \
        --out /data/frontier --max-depth 4 \
        [--domain-cap 150] [--purge-domains bad.com,worse.org] \
        [--state /data/domain_state.parquet --now 1700000000 \
         --default-delay 100 --batch-per-domain 1]

Stages (StageWriter atomic commits, resumable like every other job):

  discovered   BFS closure of the seed set over the (src, dst) links
               table within --max-depth hops, min depth per url, then
               the reference's per-domain growth cap
               (SAME_SITE_THRESHOLD=150, Crawler.py:51) and optional
               domain purge (Crawler.py:222-224)
  batch        (with --state) the politeness-eligible next batch:
               ≤ --batch-per-domain urls per domain whose robots
               crawl-delay has elapsed (Crawler.py:183-202); the state
               parquet needs (domain, last_crawl, crawl_delay)

Seeds file format: one url per line, '#' comments — exactly the
reference's start_frontier.txt (Crawler.py:81-85). Prints one JSON
metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys


def read_seeds(path: str) -> list[str]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", required=True,
                    help="(src, dst) url-pairs parquet")
    ap.add_argument("--seeds", required=True,
                    help="start_frontier.txt-style seed url list")
    ap.add_argument("--out", required=True, help="output/stage dir")
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--domain-cap", type=int, default=150,
                    help="reference SAME_SITE_THRESHOLD (Crawler.py:51)")
    ap.add_argument("--purge-domains", default="",
                    help="comma-separated domains to drop")
    ap.add_argument("--state", default=None,
                    help="(domain, last_crawl, crawl_delay) parquet; "
                         "enables the politeness batch stage")
    ap.add_argument("--now", type=int, default=None,
                    help="pinned now (epoch s); required with --state")
    ap.add_argument("--default-delay", type=int, default=100)
    ap.add_argument("--batch-per-domain", type=int, default=1)
    args = ap.parse_args(argv)
    if args.state and args.now is None:
        ap.error("--state requires --now (pinned, for replayability)")

    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import frontier
    from modern_search_engines_spark.session import get_spark
    from modern_search_engines_spark.sources.tables import StageWriter

    spark = get_spark("mse-discover-frontier")
    try:
        links = spark.read.parquet(args.links)
        seeds = spark.createDataFrame(
            [(u,) for u in read_seeds(args.seeds)], "url string")
        purged = [d for d in args.purge_domains.split(",") if d]
        sw = StageWriter(spark, args.out, verbose=True)

        params = {"max_depth": args.max_depth,
                  "domain_cap": args.domain_cap,
                  "purge": sorted(purged)}
        reach = frontier.bfs_discover(seeds, links, args.max_depth)
        dom = reach.withColumn("domain", frontier.domain_expr("url"))
        capped = frontier.cap_per_domain(dom, args.domain_cap)
        if purged:
            capped = frontier.purge_domains(
                capped, spark.createDataFrame([(d,) for d in purged],
                                              "domain string"))
        disc = sw.write_stage(capped, "discovered", params=params)
        out = {"n_seeds": seeds.count(), "n_discovered": disc.count()}

        if args.state:
            state = spark.read.parquet(args.state)
            batch = frontier.politeness_schedule(
                disc.withColumn("priority", F.col("depth")),
                state, args.now, args.default_delay,
                batch_per_domain=args.batch_per_domain,
                order_cols=("priority", "url"))
            bt = sw.write_stage(
                batch, "batch", inputs=("discovered",),
                params={**params, "now": args.now,
                        "default_delay": args.default_delay,
                        "batch_per_domain": args.batch_per_domain})
            out["n_batch"] = bt.count()
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
