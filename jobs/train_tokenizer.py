"""spark-submit entry point: train a BPE tokenizer on a corpus and
(optionally) emit exact per-document token counts under it.

    spark-submit --py-files mse.zip jobs/train_tokenizer.py \
        --docs /data/documents.parquet --out /data/tok \
        --n-merges 1000 [--max-words 200000] [--count-tokens]

The token-budget step of a training-data pipeline (mixture weights and
packing plans are denominated in tokens UNDER THE TRAINING TOKENIZER):

  stage word_counts  the ONLY corpus-wide pass (map-combinable groupBy;
                     resumable StageWriter commit, reused on rerun)
  local merge loop   functions/bpe.train_bpe over the capped word table
                     (Sennrich et al. 2016); merges + coverage stats to
                     <out>/merges.json (atomic rename)
  stage token_counts (--count-tokens) per-doc n_bpe_tokens via the
                     Arrow-batched encoder — the table
                     jobs/make_training_mix.py-style planners read

Prints one JSON line with stage metrics + coverage stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet")
    ap.add_argument("--out", required=True, help="output/stage dir")
    ap.add_argument("--n-merges", type=int, default=1000)
    ap.add_argument("--max-words", type=int, default=200_000)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--count-tokens", action="store_true",
                    help="also write per-doc BPE token counts")
    args = ap.parse_args(argv)

    from modern_search_engines_spark.functions import bpe
    from modern_search_engines_spark.session import get_spark
    from modern_search_engines_spark.sources.tables import StageWriter

    spark = get_spark("mse-train-tokenizer")
    try:
        docs = spark.read.parquet(args.docs)
        sw = StageWriter(spark, args.out, verbose=True)
        params = {"n_merges": args.n_merges, "max_words": args.max_words,
                  "text_col": args.text_col}

        # the corpus-wide stage depends ONLY on (docs, text_col) — the
        # merge-loop knobs must not invalidate it, or every tokenizer
        # tuning rerun repeats the one expensive pass
        wc = sw.write_stage(bpe.word_counts(docs, args.text_col),
                            "word_counts",
                            params={"text_col": args.text_col})
        merges, stats = bpe.train_bpe(wc, args.n_merges, args.max_words)

        merges_path = os.path.join(args.out, "merges.json")
        tmp = merges_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"merges": [list(m) for m in merges],
                       "stats": stats, "params": params}, f)
        os.replace(tmp, merges_path)  # atomic commit, job-rerun safe

        out = {"merges_path": merges_path, **stats}
        if args.count_tokens:
            counts = sw.write_stage(
                bpe.bpe_token_count(docs, merges, args.text_col,
                                    args.id_col),
                "token_counts", inputs=("word_counts",), params=params)
            agg = counts.agg({"n_bpe_tokens": "sum"}).collect()[0][0]
            out["total_bpe_tokens"] = int(agg or 0)
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
