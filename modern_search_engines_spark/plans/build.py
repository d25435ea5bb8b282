"""The staged, resumable index build — the engine's §3.1 entry point.

pages → extracted → tf → term_stats/doc_len → bm25_postings →
postings_compressed (+ docs dim, doc_dim mapping), each stage an atomic
parquet commit with manifest/lineage/metrics (``sources.tables``), so a
killed build resumes from the last complete stage and the final tables
are byte-identical to an uninterrupted run (SURVEY.md §5.6).

At cluster scale each ``write_stage`` is an Iceberg snapshot commit and
the stage directories are tables; nothing else changes.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

from ..operators import indexing, postings
from ..sources import tables
from ..sources.tables import StageWriter

STATS_FILE = "corpus_stats.json"

DOCS_DISPLAY_COLS = ("doc_id", "url", "title", "description", "icon_url",
                     "language", "warc_ts", "last_modified",
                     "sim_hi", "sim_lo")


def build_persistent_index(spark: SparkSession, pages: DataFrame,
                           out_dir: str, ngram_max: int = 3,
                           n_buckets: int = 64, n_salts: int = 8,
                           n_shards: int = 1, n_extract_chunks: int = 1,
                           use_doc2query: bool = False,
                           materialize_bm25: bool = True,
                           positional: bool = False,
                           anchor: bool = False,
                           bucket_tf: bool = False,
                           verbose: bool = True) -> dict:
    """Run (or resume) the full staged build; returns handles + stats.

    ``n_extract_chunks`` > 1 commits the extraction stage per
    url-hash-range chunk (per-partition checkpointing): a kill mid-
    extraction resumes from the last complete chunk instead of
    restarting the stage (sources/tables.py write_stage_chunked).

    ``materialize_bm25=False`` fuses the uncompressed-postings stage
    into the compressed one: the BM25 scoring plan feeds
    ``build_compressed_postings`` directly instead of round-tripping
    the index's biggest intermediate table (one row per (term, doc) —
    tf-sized) through parquet. At 100-TB scale that round-trip doubles
    the I/O of the largest stage; skip it unless the flat postings
    table itself is wanted (debugging, the naive scoring path, the
    correctness twin). Resume granularity becomes
    extracted → tf → postings_compressed.

    ``use_doc2query`` mirrors ``DocumentIndex.py:47-66`` (where it
    defaults ON): after corpus averages, every indexed doc's token
    arrays are extended with tokenized generated queries
    (operators/mlhooks.expand_for_index) so expansions flow into
    tf/df/postings. Defaults OFF here because the reference's T5
    generator isn't available in this environment — with only the
    deterministic fake, an expanded index cannot match a reference
    index anyway; flip it on when a real generator is plugged in via
    ``mlhooks.set_query_generator``. The flag is recorded in the tf
    stage's manifest params, so toggling it forces a tf rebuild on
    resume.
    """
    sw = StageWriter(spark, out_dir, verbose=verbose)

    if n_extract_chunks > 1:
        extracted = sw.write_stage_chunked(
            pages, lambda d: indexing.extract_pages(d, ngram_max),
            "extracted", n_chunks=n_extract_chunks, key_col="url")
    else:
        extracted = sw.write_stage(
            indexing.extract_pages(pages, ngram_max), "extracted")
    indexed_raw = indexing.filter_index_docs(extracted)
    indexed = indexed_raw
    if use_doc2query:
        from ..operators import mlhooks
        indexed = mlhooks.expand_for_index(indexed_raw, ngram_max)

    # corpus averages use the PRE-expansion tokens (DocumentIndex.py:50-62
    # computes them before doc2query) — avgdl never includes expansions
    def _stats() -> dict:
        stats_path = os.path.join(out_dir, STATS_FILE)
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                s = json.load(f)
        else:
            s = indexing.corpus_stats(indexed_raw)
        # record n_buckets so load_index can rebuild the flat bm25 plan
        # for fused indexes with the bucket key the compressed table uses
        if s.get("n_buckets") != n_buckets:
            s["n_buckets"] = n_buckets
            # temp + atomic rename, like every stage commit: a kill mid-
            # dump must never truncate the only copy of committed stats
            tmp = stats_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(s, f)
            os.replace(tmp, stats_path)
        return s

    # Independent stages share the cluster concurrently (Spark's driver
    # is thread-safe for job submission): corpus_stats, the docs display
    # table and the tf build all depend only on `extracted`. Running
    # them back-to-back serializes three job-scheduling floors; at bench
    # scale the fixed per-job seconds are the dominant anti-scaling term
    # (Amdahl), and on a real cluster concurrent jobs keep executors
    # busy across stage tails.
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_stats = pool.submit(_stats)
        f_pos = None
        if positional:
            # opt-in positional layer (phrase / proximity queries —
            # operators/phrase.py): body-unigram positions, bucketed by
            # the SAME term-hash key as the scoring postings so phrase
            # scans dir-prune to their terms' buckets. Depends only on
            # `extracted`, so it shares the phase-A pool. Positions are
            # over the PRE-expansion stream — doc2query pseudo-tokens
            # have no real positions.
            from ..operators import phrase as phrase_ops
            f_pos = pool.submit(
                sw.write_stage,
                phrase_ops.bucketed_positional_postings(
                    indexed_raw, n_buckets),
                "positional_postings", inputs=("extracted",),
                partition_by=["bucket"], sort_within=["term", "doc_id"],
                params={"n_buckets": n_buckets})
        else:
            # a stale positional table from a prior positional build
            # must not survive a non-positional rebuild via load_index
            sw.drop_stage("positional_postings")
        f_anchor = None
        if anchor:
            # opt-in anchor-text field (BM25F retrieval —
            # operators/anchortext.py): reads the extraction stage's
            # anchor_pairs column (collected in the SAME html parse as
            # the text — never a second parse of the corpus) and
            # inner-joins md5(href) targets against the indexed doc-id
            # set. Depends only on `extracted`, shares the phase-A
            # pool. Bucketed by the SAME term-hash key as the scoring
            # postings so BM25F scans dir-prune.
            from ..operators import anchortext
            f_anchor = pool.submit(
                sw.write_stage,
                anchortext.build_anchor_field_from_extracted(
                    extracted, indexed_raw.select("doc_id"),
                    ngram_max, n_buckets),
                "anchor_field", inputs=("extracted",),
                partition_by=["bucket"], sort_within=["term", "doc_id"],
                params={"n_buckets": n_buckets,
                        "ngram_max": ngram_max})
        else:
            # stale anchor tables must not survive a non-anchor rebuild
            sw.drop_stage("anchor_field")
            sw.drop_stage("field_norms")
        # docs sorted by doc_id within partitions (no shuffle): parquet
        # min/max stats then give tight per-row-group id ranges, which
        # the hot serving tier's bounded doc-id lookup prunes on
        # (plans/hot._doc_ids_of)
        f_docs = pool.submit(
            lambda: sw.write_stage(indexed_raw.select(*DOCS_DISPLAY_COLS),
                                   "docs", inputs=("extracted",),
                                   sort_within=["doc_id"],
                                   params={"sorted_by": "doc_id"}))
        tf_plan = indexing.build_tf(indexed, ngram_max)
        tf_kwargs = {}
        tf_params = {"use_doc2query": use_doc2query,
                     "ngram_max": ngram_max}
        if bucket_tf:
            # opt-in term-hash-bucketed tf layout (the 10^12-doc
            # default): raw-tf consumers (BM25F's body side, tfidf)
            # then partition-prune to the query terms' buckets exactly
            # like the postings scans, instead of full-scanning the
            # index's biggest table per batch. Costs one extra shuffle
            # at build (the partitioned write's co-location); params
            # record it so toggling forces a tf rebuild on resume.
            from pyspark.sql import functions as F
            tf_plan = tf_plan.withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
            tf_kwargs = {"partition_by": ["bucket"],
                         "sort_within": ["term", "doc_id"]}
            tf_params["bucket_tf_n_buckets"] = n_buckets
        f_tf = pool.submit(
            sw.write_stage, tf_plan, "tf",
            inputs=("extracted",), params=tf_params, **tf_kwargs)
        stats = f_stats.result()
        docs = f_docs.result()
        tf = f_tf.result()
        positional_tbl = f_pos.result() if f_pos is not None else None
        anchor_tbl = f_anchor.result() if f_anchor is not None else None

    field_norms_tbl = None
    if anchor:
        # per-doc (body, anchor) lengths for BM25F's normalizer —
        # derived from the COMMITTED tf + anchor_field tables so a
        # resume that skipped both stages skips this one too
        from ..operators import anchortext
        field_norms_tbl = sw.write_stage(
            anchortext.build_field_norms(tf, anchor_tbl),
            "field_norms", inputs=("tf", "anchor_field"),
            sort_within=["doc_id"])

    # term_stats is a deterministic derivation of tf, so the bm25 stage
    # consumes its own inline term-stats plan (identical result) and the
    # term_stats TABLE is committed concurrently instead of serializing
    # another job barrier before bm25. Lineage via tf covers both.
    term_stats_plan = indexing.build_term_stats(tf, stats["N"])
    doc_len = indexing.build_doc_len(tf)  # cheap, derived on the fly
    doc_fields = indexing.build_doc_fields(indexed_raw,
                                           stats["avg_date_ts"])

    # flat write (term-sorted within partitions, NOT dir-partitioned by
    # bucket): this table is the correctness twin + the compressed
    # stage's input, never the latency-critical scan — the query path
    # prunes postings_compressed. Dir-partitioning it cost an extra
    # full-table shuffle + a 64-directory small-file write for nothing.
    bm25_plan = indexing.build_bm25_postings(tf, term_stats_plan, doc_len,
                                             doc_fields, stats["avgdl"],
                                             n_buckets)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ts = pool.submit(sw.write_stage, term_stats_plan, "term_stats",
                           inputs=("tf",))
        if materialize_bm25:
            bm25 = sw.write_stage(bm25_plan, "bm25_postings",
                                  inputs=("tf",), sort_within=["term"],
                                  params={"n_buckets": n_buckets})
            compressed_input, compressed_lineage = bm25, ("bm25_postings",)
            defer_stats = None  # scores in the flat table carry idf
        else:
            # a stale flat table from a prior materialized build must not
            # survive a fused rebuild — load_index would silently serve
            # the old corpus to the naive-bm25 path
            sw.drop_stage("bm25_postings")
            bm25 = bm25_plan  # queryable plan, never round-tripped
            # deferred idf: feed the idf-LESS partials and let the
            # compressed stage broadcast-join term_stats onto the
            # per-(term,bucket) aggregate — the vocabulary join never
            # touches the posting-sized fact table (bit-identical
            # output; see build_bm25_partials)
            compressed_input = indexing.build_bm25_partials(
                tf, doc_len, doc_fields, stats["avgdl"], n_buckets)
            compressed_lineage = ("tf",)
            defer_stats = term_stats_plan
        # n_buckets (and sharding) live in the stage params: resuming
        # the same out_dir with a different bucket count must rebuild
        # these stages, not skip them and leave the on-disk layout
        # disagreeing with the n_buckets recorded in corpus_stats.json
        # pre_partitioned: the compressed plan already ends in a
        # repartition("bucket") that its merge aggregate reuses — the
        # writer must not shuffle every blob a second time
        compressed = sw.write_stage(
            postings.build_compressed_postings(compressed_input,
                                               n_salts=n_salts,
                                               n_shards=n_shards,
                                               n_buckets=n_buckets,
                                               term_stats=defer_stats),
            "postings_compressed", inputs=compressed_lineage,
            partition_by=["bucket"], sort_within=["term", "shard"],
            params={"n_buckets": n_buckets, "n_shards": n_shards},
            pre_partitioned=True)
        term_stats = f_ts.result()

    # doc_idx is a pure expression of doc_id — derive the mapping from
    # the docs table (committed in the phase-B thread pool) instead of
    # building/storing a doc_dim stage
    doc_dim = postings.doc_dim_from_docs(docs)

    return {
        "stats": stats,
        "extracted": extracted,
        "docs": docs,
        "tf": tf,
        "term_stats": term_stats,
        "bm25_postings": bm25,
        "postings_compressed": compressed,
        "doc_dim": doc_dim,
        "positional_postings": positional_tbl,
        "anchor_field": anchor_tbl,
        "field_norms": field_norms_tbl,
        "writer": sw,
    }


def load_index(spark: SparkSession, out_dir: str) -> dict:
    """Open a previously built index directory."""
    with open(os.path.join(out_dir, STATS_FILE)) as f:
        stats = json.load(f)
    from ..operators import postings as post

    rd = lambda n: spark.read.parquet(os.path.join(out_dir, n))  # noqa: E731
    docs = rd("docs")
    tf = rd("tf")
    if os.path.exists(os.path.join(out_dir, "bm25_postings")):
        bm25 = rd("bm25_postings")
    elif "n_buckets" in stats:
        # fused builds (materialize_bm25=False) never wrote the flat
        # table; rebuild the SAME lazy scoring plan the compressed stage
        # consumed so run_batch(method='bm25') works on a fused index —
        # identical partials (the fused stage fed this exact plan), just
        # computed from tf at query time instead of read from parquet
        indexed_raw = indexing.filter_index_docs(rd("extracted"))
        bm25 = indexing.build_bm25_postings(
            tf, indexing.build_term_stats(tf, stats["N"]),
            indexing.build_doc_len(tf),
            indexing.build_doc_fields(indexed_raw, stats["avg_date_ts"]),
            stats["avgdl"], stats["n_buckets"])
    else:
        # pre-n_buckets fused index: guessing a bucket count would make
        # pruned naive-bm25 queries silently wrong — surface None (the
        # WAND/compressed path is unaffected) like the pre-change code
        bm25 = None
    # back-compat: older indexes materialized doc_dim as its own table
    dim_path = os.path.join(out_dir, "doc_dim")
    doc_dim = (rd("doc_dim") if os.path.exists(dim_path)
               else post.doc_dim_from_docs(docs))
    return {
        "stats": stats,
        "docs": docs,
        "tf": tf,
        "term_stats": rd("term_stats"),
        "bm25_postings": bm25,
        "postings_compressed": rd("postings_compressed"),
        "doc_dim": doc_dim,
        "positional_postings": (
            rd("positional_postings")
            if os.path.exists(os.path.join(out_dir, "positional_postings"))
            else None),
        # read_stage_parquet: a zero-row anchor field (no in-corpus
        # links) is a legal committed stage with no data files
        "anchor_field": (
            tables.read_stage_parquet(
                spark, os.path.join(out_dir, "anchor_field"))
            if os.path.exists(os.path.join(out_dir, "anchor_field"))
            else None),
        "field_norms": (
            rd("field_norms")
            if os.path.exists(os.path.join(out_dir, "field_norms"))
            else None),
    }
