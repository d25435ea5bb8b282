"""spark-submit entry point: turn a cleaned corpus into a packed
training mix — the last mile of the training-data pipeline.

    zip -r mse.zip modern_search_engines_spark
    spark-submit --py-files mse.zip jobs/make_training_mix.py \
        --docs /data/clean --out /data/mix --seq-len 2048 \
        [--rates web=0.5,wiki=1.0] [--default-rate 0.0] \
        [--per-source-cap N] [--strata-col source] [--salt mix1] \
        [--holdout-rate 0.01] [--id-col doc_id] [--text-col text]

Stages (each an atomic, resumable StageWriter commit):

  mix       deterministic per-source mixture sampling
            (operators/sampling.stratified_sample; omitted when no
            --rates) then the per-source quota cap (cap_per_stratum;
            omitted when no --per-source-cap)
  holdout   hash-disjoint holdout split (salt = <salt>:holdout, so
            membership is independent of the mixture draw); train =
            mix minus holdout
  packed    GPT-style fixed-length sequence manifest over the TRAIN
            split (operators/packing.pack_sequences): one row per
            (seq_id, doc_id, doc_tok_begin, doc_tok_end, seq_tok_begin)

Everything is deterministic in (corpus, salt, rates): re-running
reproduces the identical mix, split and manifest on any engine or
partitioning — the property an ablation ladder and a decontamination
re-run both need. Prints ONE JSON line with row counts + stage metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_rates(s: str | None) -> dict[str, float]:
    if not s:
        return {}
    out: dict[str, float] = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        if not _ or not k:
            raise SystemExit(f"bad --rates entry: {part!r} (want k=v)")
        out[k] = float(v)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="cleaned docs parquet")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--seq-len", type=int, required=True)
    ap.add_argument("--rates", default=None,
                    help="comma list source=rate mixture weights")
    ap.add_argument("--default-rate", type=float, default=0.0)
    ap.add_argument("--per-source-cap", type=int, default=None)
    ap.add_argument("--strata-col", default="source")
    ap.add_argument("--salt", default="mix1")
    ap.add_argument("--holdout-rate", type=float, default=0.0)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import packing, sampling
    from modern_search_engines_spark.session import get_spark
    from modern_search_engines_spark.sources.tables import StageWriter

    rates = _parse_rates(args.rates)
    spark = get_spark("mse-training-mix")
    try:
        docs = spark.read.parquet(args.docs)
        sw = StageWriter(spark, args.out, verbose=True)
        params = {"rates": rates, "default_rate": args.default_rate,
                  "per_source_cap": args.per_source_cap,
                  "salt": args.salt, "seq_len": args.seq_len,
                  "holdout_rate": args.holdout_rate}

        mixed = docs
        if rates:
            mixed = sampling.stratified_sample(
                mixed, rates, strata_col=args.strata_col,
                key_col=args.id_col, default_rate=args.default_rate,
                salt=args.salt)
        if args.per_source_cap is not None:
            mixed = sampling.cap_per_stratum(
                mixed, args.per_source_cap, strata_col=args.strata_col,
                key_col=args.id_col, salt=args.salt)
        mix = sw.write_stage(mixed, "mix", params=params)

        if args.holdout_rate > 0:
            holdout = sw.write_stage(
                sampling.hash_sample(mix, args.holdout_rate,
                                     key_col=args.id_col,
                                     salt=args.salt + ":holdout"),
                "holdout", inputs=("mix",), params=params)
            train = mix.join(holdout.select(args.id_col),
                             args.id_col, "left_anti")
            n_holdout = holdout.count()
        else:
            train, n_holdout = mix, 0

        packed = sw.write_stage(
            packing.pack_sequences(train, args.seq_len,
                                   id_col=args.id_col,
                                   text_col=args.text_col),
            "packed", inputs=("mix",), params=params,
            sort_within=["seq_id"])

        n_seqs = packed.agg(
            F.count_distinct("seq_id").alias("n")).collect()[0]["n"]
        print(json.dumps({
            "n_input_docs": docs.count(),
            "n_mix_docs": mix.count(),
            "n_holdout_docs": n_holdout,
            "n_sequences": int(n_seqs),
            "seq_len": args.seq_len,
            "stages": sw.metrics(),
        }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
