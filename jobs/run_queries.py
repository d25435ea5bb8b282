"""spark-submit entry point: batch retrieval over a built index.

    spark-submit --py-files mse.zip jobs/run_queries.py \
        --index /data/index --queries queries.tsv --out run_dir \
        [--k 100] [--method wand|bm25|tfidf|phrase|bm25f]

Replicates the reference's batch runner (batch_retrieve.py:11-38): TSV
queries ``qid\\tquery`` in, one distributed scoring pass for ALL queries,
TSV run file ``qid\\trank\\turl\\tscore`` out. ``--method wand`` uses the
block-max WAND path over compressed postings (rank-identical to bm25).
``--method phrase`` treats each query as one exact phrase and scores by
occurrence count over the positional layer (requires an index built
with ``--positional``) — one bucket-pruned pass for all phrases.
``--method bm25f`` scores body + in-link anchor-text fields combined
before the k1 saturation (requires an index built with ``--anchor``;
an extension method, operators/bm25f.py).

``--rerank-diversity D`` applies the reference's MMR diversification
before writing (batch_retrieve.py:33 calls rank_documents with
relevance_importance=0.9 — i.e. D=0.1 — and consider=len(docs)); LDA
topics train once from the index's extracted tokens, topic shares are
fetched per ranking, and only the ≤k result rows ever reach the driver.
"""

from __future__ import annotations

import argparse
import os
import sys


def _rerank_results(spark, index_dir: str, results,
                    relevance_importance: float):
    """Per-query MMR diversification of a (qid, rank, doc_id, score)
    results frame — batch_retrieve.py:33 semantics, fully distributed
    (one applyInPandas group per query; nothing reaches the driver)."""
    from modern_search_engines_spark.operators import rerank

    extracted = spark.read.parquet(os.path.join(index_dir, "extracted"))
    doc_topics_df, topics = rerank.train_lda_topics(
        extracted.select("doc_id", "single_tokens"))
    return rerank.diversify_runs(
        results.select("qid", "rank", "doc_id", "score"), doc_topics_df,
        topics, relevance_importance=relevance_importance)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True, help="TSV qid\\tquery")
    ap.add_argument("--out", required=True, help="run-file output dir")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--method", default="wand",
                    choices=("wand", "bm25", "tfidf", "phrase", "bm25f"))
    ap.add_argument("--anchor-weight", type=float, default=2.0,
                    help="BM25F anchor-field weight (body weight is 1)")
    ap.add_argument("--rerank-diversity", type=float, default=None,
                    help="MMR diversity in [0,1]; reference batch run "
                         "uses 0.1 (relevance_importance=0.9)")
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
        elif args.method == "phrase":
            # each query line is one exact phrase; score = occurrence
            # count over the positional layer, one pass for all queries
            if idx.get("positional_postings") is None:
                raise SystemExit("--method phrase needs an index built "
                                 "with --positional")
            from pyspark.sql import functions as F
            from modern_search_engines_spark import textlib
            from modern_search_engines_spark.operators import (
                phrase as phrase_ops,
            )
            phrases = [(qid, textlib.tokenize(q, 1)) for qid, q in queries]
            phrases = [(qid, toks) for qid, toks in phrases if toks]
            hits = phrase_ops.phrase_occurrences_batch(
                idx["positional_postings"], phrases,
                n_buckets=idx["stats"].get("n_buckets"))
            results = qmod.topk(
                hits.select("qid", "doc_id",
                            F.col("ptf").cast("double").alias("score")),
                args.k)
        elif args.method == "bm25f":
            # body + in-link anchor-text fields combined before the k1
            # saturation (operators/bm25f.py) — an extension method
            if idx.get("anchor_field") is None:
                raise SystemExit("--method bm25f needs an index built "
                                 "with --anchor")
            from modern_search_engines_spark.operators import bm25f
            results = bm25f.run_bm25f_batch(
                spark, queries, idx, k=args.k,
                w_anchor=args.anchor_weight)
        else:
            if args.method == "tfidf":
                idx["tfidf"] = indexing.build_tfidf(idx["tf"],
                                                    idx["term_stats"])
            results = qmod.run_batch(spark, queries, idx, k=args.k,
                                     method=args.method)
        if args.rerank_diversity is not None:
            results = _rerank_results(
                spark, args.index, results, 1.0 - args.rerank_diversity)
        qmod.write_run_file(results, idx["docs"], args.out)
        print(f"wrote run file for {len(queries)} queries to {args.out}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
