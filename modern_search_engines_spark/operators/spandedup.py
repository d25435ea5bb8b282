"""Exact duplicate-SPAN removal — the ExactSubstr deduplication of Lee
et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), re-expressed for Spark at token granularity.

Whereas document-level dedup (exact/minhash/simhash) drops whole
near-duplicate documents, ExactSubstr removes the duplicated PASSAGES:
any k-token span that occurs more than once corpus-wide (including
twice in one document) is kept at its first occurrence — ordered by
(doc_id, position) — and excised everywhere else. The suffix-array
machinery of the paper is replaced by the distributed-friendly
equivalent: hashed k-gram occurrence lists.

Dataflow (all JVM expressions, no Python in the row path):

1. every doc emits its k-gram occurrences (pos, md5(k tokens)) — a
   linear fan-out, like the decontamination grams;
2. one map-side-combinable groupBy(gram) computes the occurrence count
   and the (doc_id, pos)-min winner;
3. occurrences join the (count >= 2)-filtered gram table — the join's
   build side holds only duplicated grams — and every non-winner
   occurrence becomes a remove-interval [pos, pos+k);
4. per doc, the sorted interval starts are merged into disjoint spans
   with index-aware array lambdas (O(len) per doc — no quadratic
   accumulator), the kept gaps are sliced back out of the token array,
   and the cleaned text is reassembled.

100-TB shape: two corpus-sized shuffles (the gram groupBy and the
occurrence join), one bounded per-doc aggregation (a doc's remove list
is at most its own token count — same bound as linededup's reassembly).
A head-term-style hot gram ("click here to subscribe" × 10^9) is ONE
grouped row in step 2 and a wide-but-flat join group in step 3 — there
is no gram×gram self-join anywhere. The gram key is the full 128-bit
md5: at 10^14 spans the collision odds are ~1e-10, and a collision only
ever removes one span (the paper accepts the same hash trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_occurrences(toks, k: int):
    """array<struct<pos,g>> of the doc's k-gram occurrences (1-based)."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - k + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, k))
                      .cast("binary")).alias("g"))),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))


def remove_duplicate_spans(docs: DataFrame, k: int = 50,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens_before, n_tokens_after, clean_text) — ExactSubstr
    span dedup: every k-token span occurring >= 2 times corpus-wide
    survives only at its (doc_id, pos)-first occurrence; overlapping
    removals merge. Deterministic on any engine/layout (winner is an
    order-free min, not a row_number over an arbitrary partitioning).
    """
    toks_expr = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(F.col(id_col), toks_expr.alias("toks"))
    occ = base.select(
        id_col, F.explode(_gram_occurrences(F.col("toks"), k)).alias("o")
    ).select(id_col, F.col("o.pos").alias("pos"), F.col("o.g").alias("g"))
    dups = (occ.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.min(F.struct(F.col(id_col).alias("i"),
                                F.col("pos").alias("p"))).alias("__w"))
            .where(F.col("__n") >= 2)
            .select("g", "__w"))
    losers = (occ.join(dups, "g")
              .where(~((F.col(id_col) == F.col("__w.i"))
                       & (F.col("pos") == F.col("__w.p"))))
              .select(id_col, "pos"))
    iv = losers.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("ps"))

    j = base.join(iv, id_col, "left")
    ps = F.coalesce(F.col("ps"), F.array().cast("array<int>"))
    # merged remove-spans from the sorted interval starts: because all
    # intervals share length k, position p opens a NEW merged span iff
    # it clears the previous start by more than k — index lambdas make
    # the whole merge one O(len) vector pass
    starts = F.filter(ps, lambda p, i: (i == F.lit(0))
                      | (p - F.element_at(ps, i) > k))
    ends = F.transform(
        F.filter(ps, lambda p, i: (i == F.size(ps) - 1)
                 | (F.element_at(ps, i + 2) - p > k)),
        lambda p: p + k)
    # kept gaps are the complement: [1,s1) [e1,s2) ... [em, len+1)
    toks = F.col("toks")
    gap_s = F.concat(F.array(F.lit(1)), ends)
    gap_e = F.concat(starts, F.array(F.size(toks) + 1))
    kept = F.flatten(F.zip_with(gap_s, gap_e,
                                lambda s, e: F.slice(toks, s, e - s)))
    return j.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.concat_ws(" ", kept).alias("clean_text"))
