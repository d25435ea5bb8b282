"""spark-submit entry point: batch retrieval over a built index.

    spark-submit --py-files mse.zip jobs/run_queries.py \
        --index /data/index --queries queries.tsv --out run_dir \
        [--k 100] [--method wand|bm25|tfidf]

Replicates the reference's batch runner (batch_retrieve.py:11-38): TSV
queries ``qid\\tquery`` in, one distributed scoring pass for ALL queries,
TSV run file ``qid\\trank\\turl\\tscore`` out. ``--method wand`` uses the
block-max WAND path over compressed postings (rank-identical to bm25).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True, help="TSV qid\\tquery")
    ap.add_argument("--out", required=True, help="run-file output dir")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--method", default="wand",
                    choices=("wand", "bm25", "tfidf"))
    args = ap.parse_args(argv)

    from modern_search_engines_spark.operators import query as qmod
    from modern_search_engines_spark.operators import indexing, wand
    from modern_search_engines_spark.plans.build import load_index
    from modern_search_engines_spark.session import get_spark
    from modern_search_engines_spark.sources.tables import read_queries_tsv

    spark = get_spark("mse-run-queries")
    try:
        idx = load_index(spark, args.index)
        queries = read_queries_tsv(spark, args.queries)
        if args.method == "wand":
            results = wand.run_wand(spark, queries,
                                    idx["postings_compressed"],
                                    idx["doc_dim"], k=args.k)
        else:
            if args.method == "tfidf":
                idx["tfidf"] = indexing.build_tfidf(idx["tf"],
                                                    idx["term_stats"])
            results = qmod.run_batch(spark, queries, idx, k=args.k,
                                     method=args.method)
        qmod.write_run_file(results, idx["docs"], args.out)
        print(f"wrote run file for {len(queries)} queries to {args.out}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
