"""spark-submit entry point: staged training-data corpus cleaning.

    zip -r mse.zip modern_search_engines_spark
    spark-submit --py-files mse.zip jobs/clean_corpus.py \
        --docs /data/documents_parquet --out /data/clean \
        [--langs en] [--min-tokens 5] [--max-rep-ratio 0.5] \
        [--jaccard-threshold 0.6] [--n-minhash 8] [--n-bands 4] \
        [--max-shingle-df 10000] [--id-col doc_id] [--text-col text] \
        [--transitive] [--evalset /data/eval_parquet] [--decontam-n 8] \
        [--drop-dup-lines] [--scrub-pii] [--per-source-cap N] \
        [--strata-col source] [--dedup-urls] [--url-col url] \
        [--c4-rules] [--ppl-keep head,middle] [--ppl-train /data/wiki] \
        [--lang-col lang]

documents → doc_stats → doc_status → clean [→ curated] (each an
atomic, resumable stage commit — plans/clean.py; the curated stage runs
when any curation flag is set: canonical-URL dedup → C4 page/line
rules → eval-set decontamination → corpus line dedup → PII scrub →
CCNet perplexity-bucket gate → per-source quota cap). Prints one JSON
line:
per-status counts + per-stage metrics. Re-running with the same --out
resumes.
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
    ap.add_argument("--transitive", action="store_true",
                    help="connected-components near-dup clusters "
                         "(one survivor per component)")
    ap.add_argument("--evalset", default=None,
                    help="benchmark parquet (text column) to "
                         "decontaminate against")
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument("--drop-dup-lines", action="store_true",
                    help="corpus-level line dedup (C4 rule)")
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--per-source-cap", type=int, default=None)
    ap.add_argument("--strata-col", default="source")
    ap.add_argument("--dedup-urls", action="store_true",
                    help="drop canonical-URL duplicates (urlnorm)")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--c4-rules", action="store_true",
                    help="C4 line rules rewrite text; page rules drop")
    ap.add_argument("--ppl-keep", default=None,
                    help="comma-separated CCNet buckets to keep "
                         "(e.g. head,middle); enables the LM gate")
    ap.add_argument("--ppl-train", default=None,
                    help="reference-corpus parquet to train the LM on "
                         "(CCNet's Wikipedia slot); default self-train")
    ap.add_argument("--lang-col", default="lang")
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
            text_col=args.text_col, id_col=args.id_col,
            transitive=args.transitive,
            evalset=(spark.read.parquet(args.evalset)
                     if args.evalset else None),
            decontam_n=args.decontam_n,
            drop_dup_lines=args.drop_dup_lines,
            scrub_pii=args.scrub_pii,
            per_source_cap=args.per_source_cap,
            strata_col=args.strata_col,
            dedup_urls=args.dedup_urls, url_col=args.url_col,
            c4_rules=args.c4_rules,
            ppl_keep=(tuple(args.ppl_keep.split(","))
                      if args.ppl_keep else None),
            ppl_train=(spark.read.parquet(args.ppl_train)
                       if args.ppl_train else None),
            lang_col=args.lang_col, verbose=True)
        print(json.dumps({"summary": res["summary"],
                          "stages": res["writer"].metrics()}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
