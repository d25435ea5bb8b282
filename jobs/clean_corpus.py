"""spark-submit entry point: staged training-data corpus cleaning.

    zip -r mse.zip modern_search_engines_spark
    spark-submit --py-files mse.zip jobs/clean_corpus.py \
        --docs /data/documents_parquet --out /data/clean \
        [--langs en] [--min-tokens 5] [--max-rep-ratio 0.5] \
        [--jaccard-threshold 0.6] [--n-minhash 8] [--n-bands 4] \
        [--max-shingle-df 10000] [--id-col doc_id] [--text-col text]

documents → doc_stats → doc_status → clean (each an atomic, resumable
stage commit — plans/clean.py). Prints one JSON line: per-status counts
+ per-stage metrics. Re-running with the same --out resumes.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents parquet path (id + text columns)")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--langs", default="en",
                    help="comma-separated languages to keep")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-rep-ratio", type=float, default=0.5)
    ap.add_argument("--jaccard-threshold", type=float, default=0.6)
    ap.add_argument("--n-minhash", type=int, default=8)
    ap.add_argument("--n-bands", type=int, default=4)
    ap.add_argument("--max-shingle-df", type=int, default=None,
                    help="drop shingles in more docs than this before "
                         "the near-dup join (hot-shingle scale guard)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args(argv)

    from modern_search_engines_spark.plans.clean import clean_corpus
    from modern_search_engines_spark.session import get_spark

    spark = get_spark("mse-clean-corpus")
    try:
        docs = spark.read.parquet(args.docs)
        res = clean_corpus(
            spark, docs, args.out,
            langs=tuple(args.langs.split(",")),
            min_tokens=args.min_tokens,
            max_rep_ratio=args.max_rep_ratio,
            jaccard_threshold=args.jaccard_threshold,
            n_minhash=args.n_minhash, n_bands=args.n_bands,
            max_shingle_df=args.max_shingle_df,
            text_col=args.text_col, id_col=args.id_col, verbose=True)
        print(json.dumps({"summary": res["summary"],
                          "stages": res["writer"].metrics()}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
