"""Bigram co-occurrence + PMI — collocation mining over the corpus.

Pointwise mutual information over adjacent token pairs (Church &
Hanks 1990, public) is the standard corpus-analytics pass for
collocation discovery, phrase vocabulary induction, and tokenizer
diagnostics — a natural sibling of the BPE pair-count pass
(``functions/bpe.py``) that works on word bigrams instead of
character pairs. No reference counterpart (the reference has no
corpus-analytics surface at all); ENGINE EXTENSION.

Spark shape: token arrays are built once per doc (map-only); bigrams
come from zipping the array with its own 1-shifted slice — still
map-only, no posexplode self-join (the naive (doc,pos) ⋈ (doc,pos+1)
formulation shuffles the whole token stream twice and is exactly what
this avoids). Then: one shuffle each for the unigram and bigram
counts (both map-side combinable — stopword-heavy keys arrive as
per-task partials), two scalar totals, and two keyed joins of the
bigram table against the unigram table on term. At 10^12 docs the
unigram side is vocabulary-sized (10^7–10^9 rows) — too big to
broadcast by default, fine as a shuffle join on term; AQE splits any
residual hot key.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def bigram_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Adjacent-pair counts: (term_a, term_b, cnt), pairs within a doc
    only (no cross-doc adjacency)."""
    toks = _tokens(text_col)
    n_pairs = F.greatest(F.size("toks") - F.lit(1), F.lit(0))
    pairs = (docs
             .select(toks.alias("toks"))
             .select(F.arrays_zip(
                 F.slice("toks", 1, n_pairs).alias("term_a"),
                 F.slice(F.col("toks"), 2, n_pairs).alias("term_b"))
                 .alias("bi"))
             .select(F.explode("bi").alias("p")))
    return (pairs.groupBy(F.col("p.term_a").alias("term_a"),
                          F.col("p.term_b").alias("term_b"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def unigram_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    return (docs.select(F.explode(_tokens(text_col)).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))


def bigram_pmi(docs: DataFrame, *, text_col: str = "text",
               min_count: int = 5) -> DataFrame:
    """PMI per adjacent pair: ln(P(a,b) / (P(a)·P(b))), P from corpus
    bigram/unigram totals; pairs below ``min_count`` dropped (rare-pair
    PMI is noise — the standard Church-Hanks cutoff).

    The float expression is written as the same IEEE tree the SQL twin
    uses — (cnt/tot_bi) / ((ua/tot_uni)·(ub/tot_uni)) then one ln —
    so both engines round the identical double at 6 decimals.
    """
    bi = bigram_counts(docs, text_col=text_col).filter(
        F.col("cnt") >= min_count)
    uni = unigram_counts(docs, text_col=text_col)
    # two scalar totals; tiny collected aggregates, same pattern as the
    # BM25 avgdl scalar (contract.q_bm25_topk)
    tot_uni = float(uni.agg(F.sum("cnt")).collect()[0][0])
    # total bigram mass must count ALL pairs, not just the ones past
    # min_count — recompute from doc sizes (map-only + one scalar agg)
    tot_bi = float(docs.select(
        F.greatest(F.size(_tokens(text_col)) - F.lit(1), F.lit(0))
        .alias("m")).agg(F.sum("m")).collect()[0][0])
    ua = uni.select(F.col("term").alias("term_a"),
                    F.col("cnt").alias("cnt_a"))
    ub = uni.select(F.col("term").alias("term_b"),
                    F.col("cnt").alias("cnt_b"))
    p_ab = F.col("cnt").cast("double") / F.lit(tot_bi)
    p_a = F.col("cnt_a").cast("double") / F.lit(tot_uni)
    p_b = F.col("cnt_b").cast("double") / F.lit(tot_uni)
    return (bi.join(ua, "term_a").join(ub, "term_b")
            .select("term_a", "term_b", "cnt",
                    F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi")))
