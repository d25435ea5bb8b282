"""Positional postings + phrase / proximity / conjunctive matching.

The reference engine's inverted index keeps term -> doc-id sets only
(``backend/core/DocumentIndex.py:32,131`` — no positions), so its query
engine cannot answer phrase ("exact sequence") or proximity ("all terms
within a window") queries; every classic fulltext index grows them next.
This module adds the positional layer Spark-first (re-expressed, NOT
copied — there is no reference implementation to copy):

* ``positional_postings`` — (id, pos, term), 1-based positions over the
  whitespace token array. At cluster scale this is a persisted table
  partitioned by ``bucket(term_hash)`` exactly like the scoring postings
  (operators/postings.py), so a phrase query's scan is pruned to the
  phrase terms' buckets.
* ``phrase_occurrences`` — phrase tf per doc in ONE shuffle, no
  self-join chain: each posting row for a phrase term is tagged with the
  term's offset(s) inside the phrase (a broadcast ≤L-row table; repeated
  terms get one row per offset), ``anchor = pos - offset`` aligns every
  token of a true occurrence on the same (id, anchor) key, and one
  groupBy counts DISTINCT offsets == phrase length. The classic
  positional-intersection join chain is L-1 shuffles of the same rows;
  this anchor trick is one, and the pre-join ``term IN (phrase)`` filter
  is pushed to the scan.
* ``proximity_match`` — docs where all query terms co-occur within a
  ``window``-token span: per-doc ordered scan of the (tiny, pre-filtered)
  query-term postings carrying a running last-seen position per term;
  a span ends at any row where every term's last occurrence is within
  ``window`` tokens.
* ``conjunctive_match`` — AND-semantics doc filter (all distinct terms
  present); composes with BM25 scoring for conjunctive top-k.

All four stay JVM-side (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def positional_postings(docs: DataFrame, tokens_col,
                        id_col: str = "doc_id") -> DataFrame:
    """(id, pos, term) with 1-based ``pos`` over the token array."""
    return docs.select(
        id_col, F.posexplode(tokens_col).alias("pos0", "term")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "term")


def _offsets_df(spark: SparkSession, phrase: list[str]) -> DataFrame:
    """Broadcastable (term, off) rows, one per occurrence of the term in
    the phrase (0-based offset). Repeated phrase terms yield one row per
    slot, so a single token row fans out to every slot it could fill."""
    if not phrase:
        raise ValueError("empty phrase")
    return spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "term string, off int")


def phrase_occurrences(ptok: DataFrame, phrase: list[str],
                       id_col: str = "doc_id") -> DataFrame:
    """(id, ptf) — number of occurrences of ``phrase`` as consecutive
    tokens, one shuffle on (id, anchor).

    A position can satisfy only one offset per anchor, so for an
    occurrence anchored at a, the rows (a+i, term_i) for i in 0..L-1
    each contribute offset i to group (id, a); countDistinct(off) == L
    iff every slot matched. Over-counting is impossible: (id, pos, off)
    triples are unique because ptok rows are unique per (id, pos).
    """
    spark = ptok.sparkSession
    offs = _offsets_df(spark, phrase)
    tagged = (
        ptok.where(F.col("term").isin(list(set(phrase))))
        .join(F.broadcast(offs), "term")
        .select(id_col, (F.col("pos") - F.col("off")).alias("anchor"),
                "off")
    )
    hits = (tagged.groupBy(id_col, "anchor")
            .agg(F.countDistinct("off").alias("n_off"))
            .where(F.col("n_off") == len(phrase)))
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("ptf"))


def phrase_occurrences_batch(ptok: DataFrame,
                             phrases: list[tuple[str, list[str]]],
                             id_col: str = "doc_id",
                             n_buckets: int | None = None) -> DataFrame:
    """(qid, id, ptf) for MANY phrases in one distributed pass — the
    batch-retrieval discipline (operators/query.py run_batch): every
    phrase's (term, offset) tags go into one broadcast table, one
    groupBy counts distinct offsets per (qid, id, anchor) against the
    phrase's own length, one more aggregates occurrence counts. With
    ``n_buckets`` the scan is pruned to the union of the phrase terms'
    buckets."""
    spark = ptok.sparkSession
    terms = sorted({t for _, toks in phrases for t in toks})
    if not terms:
        raise ValueError("no non-empty phrases")
    if n_buckets is not None:
        ptok = prune_positional(ptok, terms, n_buckets)
    offs = spark.createDataFrame(
        [(qid, t, i, len(toks))
         for qid, toks in phrases for i, t in enumerate(toks)],
        "qid string, term string, off int, plen int")
    tagged = (
        ptok.where(F.col("term").isin(terms))
        .join(F.broadcast(offs), "term")
        .select("qid", id_col,
                (F.col("pos") - F.col("off")).alias("anchor"),
                "off", "plen")
    )
    hits = (tagged.groupBy("qid", id_col, "anchor", "plen")
            .agg(F.countDistinct("off").alias("n_off"))
            .where(F.col("n_off") == F.col("plen")))
    return hits.groupBy("qid", id_col).agg(
        F.count(F.lit(1)).alias("ptf"))


def proximity_match(ptok: DataFrame, terms: list[str], window: int,
                    id_col: str = "doc_id") -> DataFrame:
    """(id,) docs where all distinct ``terms`` appear within any
    ``window``-token span (inclusive: max_pos - min_pos <= window - 1).

    Shape: the postings are first filtered to the query terms (scan
    prune — the surviving rows per doc are ~tf of the query terms, tiny
    vs the document), then ONE per-doc ordered window carries, for each
    term t, the running last-seen position ``last_t`` (max of pos where
    term == t over the unbounded-preceding frame). A window of width
    ``window`` ending at the current row exists iff every ``last_t`` is
    non-null and ``pos - min_t(last_t) <= window - 1``. Exact — every
    minimal co-occurrence span ends at an occurrence of one of the
    terms, so scanning only query-term rows misses nothing. The L
    running-max expressions share one Window spec (one shuffle + one
    sort); L = |distinct terms| is query-sized, not data-sized.
    """
    tset = sorted(set(terms))
    rows = ptok.where(F.col("term").isin(tset))
    run = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(run)
        .alias(f"last_{i}")
        for i, t in enumerate(tset)
    ]
    rows = rows.select(id_col, "pos", *lasts)
    last_cols = [F.col(f"last_{i}") for i in range(len(tset))]
    min_last = last_cols[0] if len(last_cols) == 1 else F.least(*last_cols)
    span_ok = F.col("pos") - min_last <= window - 1
    all_seen = None
    for i in range(len(tset)):
        cond = F.col(f"last_{i}").isNotNull()
        all_seen = cond if all_seen is None else (all_seen & cond)
    return (rows.where(all_seen & span_ok)
            .select(id_col).distinct())


def bucketed_positional_postings(extracted: DataFrame,
                                 n_buckets: int = 64) -> DataFrame:
    """(doc_id, pos, term, bucket) over the body unigram stream
    (``doc_unigrams`` — same cleaned tokens the tf stage counts), with
    the SAME term-hash bucket key as the scoring postings
    (operators/postings.py): ``bucket`` becomes the stage's partition
    column, so a phrase query's scan is dir-pruned to its terms'
    buckets exactly like BM25 retrieval is."""
    ptok = positional_postings(extracted, F.col("doc_unigrams"))
    return ptok.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))


def prune_positional(ptok: DataFrame, terms: list[str],
                     n_buckets: int = 64) -> DataFrame:
    """Partition-prune a bucketed positional table to the query terms'
    buckets (driver-side xxhash64 twin, canary-checked; Spark-job
    fallback) — same contract as query.prune_postings."""
    from ..functions import hashing

    if hashing.self_check():
        buckets = sorted({hashing.bucket_of(t, n_buckets)
                          for t in set(terms)})
    else:
        spark = ptok.sparkSession
        tdf = spark.createDataFrame([(t,) for t in set(terms)],
                                    "term string")
        buckets = sorted({
            r["b"] for r in
            tdf.select(F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                       .alias("b")).distinct().collect()})
    if not buckets:
        return ptok.where(F.lit(False))
    return ptok.where(F.col("bucket").isin(buckets))


def phrase_topk(ptok: DataFrame, phrase: list[str], k: int = 50,
                n_buckets: int | None = None,
                id_col: str = "doc_id") -> DataFrame:
    """(id, ptf, rank) — top-k docs by phrase occurrence count over a
    positional table; when ``n_buckets`` is given the table is treated
    as bucket-partitioned and the scan is pruned first."""
    from .topk import ranked_topk

    if n_buckets is not None:
        ptok = prune_positional(ptok, phrase, n_buckets)
    hits = phrase_occurrences(ptok, phrase, id_col=id_col)
    return ranked_topk(hits, [F.desc("ptf"), F.asc(id_col)], k,
                       key_col=id_col).select(id_col, "ptf", "rank")


def conjunctive_match(tf: DataFrame, terms: list[str],
                      id_col: str = "doc_id") -> DataFrame:
    """(id,) docs containing ALL distinct ``terms`` (AND semantics).

    tf rows are unique per (id, term), so a plain count after the
    IN-filter equals the distinct-term count; one shuffle on id."""
    tset = sorted(set(terms))
    return (tf.where(F.col("term").isin(tset))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_terms"))
            .where(F.col("n_terms") == len(tset))
            .select(id_col))
