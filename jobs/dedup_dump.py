"""spark-submit entry point: incremental (cross-dump) deduplication.

    zip -r mse.zip modern_search_engines_spark
    spark-submit --py-files mse.zip jobs/dedup_dump.py \
        --seen /data/corpus_parquet --new /data/dump_parquet \
        --index /data/seen_index --out /data/dump_status \
        [--jaccard-threshold 0.2] [--n-minhash 8] [--n-bands 4] \
        [--max-band-docs N] [--id-col doc_id] [--text-col text] \
        [--no-bloom] [--bloom-fpp 0.01]

The exact-dup probe runs behind a broadcast Bloom prefilter BY DEFAULT
(the production shape for 10^9-key seen sets: only true dups + ~fpp
false positives shuffle to the md5 join, which verifies exactly — the
output is identical either way). The filter is rebuilt per run from
the resumed seen_md5 stage in one pass over the KEY table, never the
corpus; probe-side row reduction is reported in the JSON summary.

The seen corpus is reduced ONCE to three reusable index stages under
--index (md5 → min id, minhash signatures, distinct shingles — atomic
resumable StageWriter commits, exactly like the index build): the
first run builds them, every later dump run with the same --index
RESUMES them without rescanning the corpus, which is the operational
point of cross-dump dedup. The new dump is then classified exact_dup /
near_dup / new and written to --out; one JSON line with status counts
+ stage metrics goes to stdout. Omit --jaccard-threshold to run the
exact-only (md5) pass.

After ingesting an accepted dump, rebuild or extend the seen index
(rerun with --seen pointing at the grown corpus and a fresh --index,
or union the new docs' stage outputs) — the stage manifests record the
params so a mismatched n_minhash fails loudly instead of silently
mixing signature families.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seen", required=True,
                    help="ingested-corpus parquet (id + text columns)")
    ap.add_argument("--new", required=True, help="new dump parquet")
    ap.add_argument("--index", required=True,
                    help="seen-index dir (stages resumed across runs)")
    ap.add_argument("--out", required=True,
                    help="output parquet dir for the dump's statuses")
    ap.add_argument("--jaccard-threshold", type=float, default=None)
    ap.add_argument("--n-minhash", type=int, default=8)
    ap.add_argument("--n-bands", type=int, default=4)
    ap.add_argument("--max-band-docs", type=int, default=None,
                    help="raise if a seen band bucket exceeds this "
                         "(degenerate-corpus guard)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-bloom", action="store_true",
                    help="skip the broadcast Bloom prefilter on the "
                         "exact-dup probe (on by default — the standard "
                         "production shape for large seen sets; the "
                         "keyed join verifies exactly either way)")
    ap.add_argument("--bloom-fpp", type=float, default=0.01,
                    help="Bloom false-positive rate (1%% = ~9.6 bits/"
                         "key = ~1.2 GB per 10^9 seen keys)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import crossdedup
    from modern_search_engines_spark.session import get_spark
    from modern_search_engines_spark.sources.tables import StageWriter

    spark = get_spark("mse-dedup-dump")
    try:
        seen = spark.read.parquet(args.seen)
        new = spark.read.parquet(args.new)
        params = {"n_minhash": args.n_minhash, "id_col": args.id_col,
                  "text_col": args.text_col}
        sw = StageWriter(spark, args.index, verbose=True)
        md5, sig, sh = crossdedup.seen_index(
            seen, args.text_col, args.id_col, args.n_minhash)
        md5 = sw.write_stage(md5, "seen_md5", params=params)
        need_near = args.jaccard_threshold is not None
        if need_near:
            sh = sw.write_stage(sh, "seen_shingles", params=params)
            sig = sw.write_stage(sig, "seen_sig",
                                 inputs=("seen_shingles",), params=params)
        bloom_stats = None
        bf = None
        if not args.no_bloom:
            # built from the RESUMED seen_md5 stage (one pass over the
            # key table, never the corpus); output is identical with or
            # without it — the md5 join verifies exactly
            bf = crossdedup.seen_bloom_filter(md5, fpp=args.bloom_fpp)
            from modern_search_engines_spark.operators import bloom
            probe_in = new.count()
            probe_out = (new.select(
                F.md5(F.col(args.text_col).cast("binary"))
                .alias("text_md5"))
                .where(bloom.might_contain(bf, F.col("text_md5")))
                .count())
            bloom_stats = {"n_keys": bf.n_keys, "m_bits": bf.m_bits,
                           "fpp_target": bf.fpp_target,
                           "probe_rows_in": probe_in,
                           "probe_rows_out": probe_out}
        status = crossdedup.dedup_against(
            new, text_col=args.text_col, id_col=args.id_col,
            n_minhash=args.n_minhash, n_bands=args.n_bands,
            jaccard_threshold=args.jaccard_threshold,
            seen_md5=md5,
            seen_sig=sig if need_near else None,
            seen_sh=sh if need_near else None,
            max_band_docs=args.max_band_docs,
            seen_bloom=bf)
        out_sw = StageWriter(spark, args.out, verbose=True)
        status = out_sw.write_stage(status, "dump_status",
                                    params=dict(params,
                                                jaccard=args.jaccard_threshold,
                                                n_bands=args.n_bands))
        summary = {r["status"]: r["n"] for r in
                   status.groupBy("status")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
        print(json.dumps({"summary": summary,
                          "bloom": bloom_stats,
                          "index_stages": sw.metrics(),
                          "out_stages": out_sw.metrics()}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
