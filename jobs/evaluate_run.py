"""spark-submit entry point: evaluate a retrieval run file against qrels.

    spark-submit --py-files mse.zip jobs/evaluate_run.py \
        --run /data/run.tsv --qrels /data/qrels.tsv [--model NAME]

Completes the reference's batch lifecycle: ``batch_retrieve.py`` writes
``qid\\trank\\turl\\tscore`` run files (our ``jobs/run_queries.py``
equivalent) and the Streamlit EvaluatePage scores them against human
labels (subpages/EvaluatePage.py:21-51) — here as a distributed job over
``operators/evaluate.evaluate_runs`` with the reference's exact metric
quirks (binary gains, IDCG over ALL ground truth, AP divided by |gt|).

qrels TSV format: ``qid\\turl\\trelevant`` with relevant ∈ {1, -1} —
the tabular analog of the reference's DatasetEntry labels.

Prints one JSON line: per-query metrics + corpus means.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="run TSV (qid, rank, url, score)")
    ap.add_argument("--qrels", required=True,
                    help="qrels TSV (qid, url, relevant in {1,-1})")
    ap.add_argument("--model", default="run",
                    help="model name for the summary row")
    ap.add_argument("--per-query-out", default=None,
                    help="optional parquet path for the full per-query "
                         "metric table (distributed write — at millions "
                         "of queries the table must not be collected)")
    ap.add_argument("--json-queries-cap", type=int, default=1000,
                    help="max per-query entries inlined in the JSON")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import evaluate
    from modern_search_engines_spark.session import get_spark

    spark = get_spark("mse-evaluate-run")
    try:
        runs = (spark.read.option("sep", "\t")
                .schema("qid string, rank int, url string, score double")
                .csv(args.run))
        qrels = (spark.read.option("sep", "\t")
                 .schema("qid string, url string, relevant int")
                 .csv(args.qrels))
        per_q = evaluate.evaluate_runs(runs, qrels).cache()
        summary = evaluate.summarize_by_model(
            per_q.withColumn("model", F.lit(args.model)))
        if args.per_query_out:
            per_q.write.mode("overwrite").parquet(args.per_query_out)
        # JSON inlines a bounded per-query sample; the full table goes
        # through the distributed parquet sink above
        sample = per_q.orderBy("qid").limit(args.json_queries_cap)
        out = {
            "per_query": {r["qid"]: {"mrr": r["mrr"], "ndcg": r["ndcg"],
                                     "map": r["map"]}
                          for r in sample.collect()},
            "per_query_truncated":
                per_q.count() > args.json_queries_cap,
            "summary": [row.asDict() for row in summary.collect()],
        }
        print(json.dumps(out))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
