"""Benchmark decontamination — remove training documents that overlap
an evaluation/benchmark set by any shared n-token n-gram.

The standard pre-training hygiene step (the GPT-3 appendix and every
public pipeline since — C4, The Pile, Dolma, FineWeb — ship a variant):
a training doc is CONTAMINATED iff it shares at least one n-gram of
whitespace tokens with any benchmark text; contaminated docs are
dropped (or flagged for audit) before training.

Scale shape — the asymmetry is the whole design:

* the CORPUS side is the 100-TB side; the EVAL side is benchmark suites
  (10^3–10^7 n-grams) and fits in an executor broadcast. The membership
  probe is therefore a **broadcast semi-join**: one map-only pass over
  the corpus, no corpus-side shuffle at all for the flag, and only a
  doc-id aggregation (map-side combinable count) for the hit summary.
* n-grams travel as ``md5`` hex digests (fixed 32 bytes), never as the
  n-token strings, so the exploded corpus-side rows stay narrow. A
  2^-128 collision flags one extra doc — the conservative direction
  for decontamination (documented, same stance as exact-dedup).
* the corpus side explodes to ~tokens-per-doc rows; with the broadcast
  hash join pushed below the aggregation, Spark never materializes the
  exploded table — it streams through the join and partial-aggregates
  per task.

If the eval side ever outgrows a broadcast (decontaminating against
another *corpus*), the same two expressions feed a shuffle semi-join on
the gram key — flip ``broadcast_eval=False``; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ngram_hashes_expr(text_col: Column, n: int) -> Column:
    """text → array of md5 hex digests of every n-token window (space-
    rejoined whitespace tokens; identical semantics in the DuckDB twin).
    Documents shorter than ``n`` tokens yield an empty array."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    n_grams = F.size(toks) - F.lit(n - 1)
    return F.when(
        n_grams > 0,
        F.transform(F.sequence(F.lit(1), n_grams),
                    lambda i: F.md5(F.concat_ws(
                        " ", F.slice(toks, i, n)).cast("binary"))),
    ).otherwise(F.array().cast("array<string>"))


def find_contaminated(docs: DataFrame, evalset: DataFrame, n: int = 8,
                      text_col: str = "text", id_col: str = "doc_id",
                      eval_text_col: str = "text",
                      broadcast_eval: bool = True) -> DataFrame:
    """(id, n_hits) — every doc sharing ≥1 n-gram with the eval set,
    with the number of its distinct overlapping grams (audit signal:
    1 hit ≈ quotation; hundreds ≈ the benchmark itself leaked in)."""
    grams = (docs
             .select(F.col(id_col),
                     F.explode(ngram_hashes_expr(F.col(text_col), n))
                     .alias("gram")))
    ev = (evalset
          .select(F.explode(ngram_hashes_expr(F.col(eval_text_col), n))
                  .alias("gram"))
          .distinct())
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (grams.join(ev, "gram", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").cast("long").alias("n_hits")))


def find_contaminated_fuzzy(docs: DataFrame, evalset: DataFrame,
                            threshold: float = 0.5,
                            n_minhash: int = 8, n_bands: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            eval_id_col: str = "eval_id",
                            eval_text_col: str = "text",
                            broadcast_eval: bool = True,
                            cache_registry: list | None = None
                            ) -> DataFrame:
    """(id, eval_id, jaccard) — FUZZY decontamination: every training
    doc whose word-trigram shingle set has Jaccard ≥ ``threshold``
    against some benchmark document (best match: highest jaccard, ties
    to the smallest eval id). The exact n-gram probe
    (``find_contaminated``) misses paraphrased/reformatted benchmark
    leaks (whitespace renorm, one token edited per window kills every
    exact window); this is the near-dup complement the public pipelines
    pair with it (e.g. the Llama/GPT-4 eval-overlap appendices measure
    token-overlap fractions rather than exact windows only).

    Scale shape — same asymmetry as the exact probe:

    * eval side (10^3-10^6 docs) → minhash signatures + band keys +
      shingles, all **broadcast**; the corpus side is one shingle pass
      and a map-side band probe — the corpus never shuffles to find
      candidates (``broadcast_eval=False`` flips every eval join to a
      shuffle join for corpus-vs-corpus, nothing else changes);
    * candidates are verified with EXACT jaccard (intersection against
      the broadcast eval shingle table), so false positives are zero
      and recall is the standard banding curve 1-(1-s^r)^b — raise
      ``n_minhash``/``n_bands`` to push recall at the threshold.

    The corpus shingle table feeds three subtrees (signatures, the
    verify join, sizes) and is ``.cache()``d; long-lived sessions pass
    ``cache_registry`` and unpersist afterwards (the plans/clean.py
    convention).
    """
    from . import crossdedup, dedup

    sh_c = crossdedup.shingles_of(docs, text_col, id_col).cache()
    if cache_registry is not None:
        cache_registry.append(sh_c)
    sh_e = (crossdedup.shingles_of(
        evalset.select(F.col(eval_id_col).alias("doc_id"),
                       F.col(eval_text_col).alias("text")))
        .withColumnRenamed("doc_id", "eval_id"))
    sig_c = dedup.minhash_signatures(sh_c, n_minhash)
    sig_e = dedup.minhash_signatures(
        sh_e.withColumnRenamed("eval_id", "doc_id"), n_minhash)

    def _bands(sig: DataFrame, name: str) -> DataFrame:
        return dedup.banded_ids(sig, name, n_minhash, n_bands)

    eb = _bands(sig_e, "eval_id")
    esh = sh_e
    esz = sh_e.groupBy("eval_id").agg(F.count(F.lit(1)).alias("nb"))
    if broadcast_eval:
        eb, esh, esz = F.broadcast(eb), F.broadcast(esh), F.broadcast(esz)

    cand = (_bands(sig_c, id_col).join(eb, "band")
            .select(id_col, "eval_id").distinct())
    csz = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na")) \
              .withColumnRenamed("doc_id", id_col)
    inter = (cand
             .join(sh_c.withColumnRenamed("doc_id", id_col), id_col)
             .join(esh, ["eval_id", "sh"])
             .groupBy(id_col, "eval_id")
             .agg(F.count(F.lit(1)).alias("i")))
    jac = (inter.join(csz, id_col).join(esz, "eval_id")
           .select(id_col, "eval_id",
                   (F.col("i").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"))
           .where(F.col("j") >= threshold))
    # best match per doc: one map-side-combinable min over an orderable
    # struct (same pattern as crossdedup.dedup_against)
    return (jac.groupBy(id_col)
            .agg(F.min(F.struct((-F.col("j")).alias("nj"),
                                F.col("eval_id").alias("eid"))).alias("b"))
            .select(id_col, F.col("b.eid").alias("eval_id"),
                    F.round(-F.col("b.nj"), 6).alias("jaccard")))


def decontaminate(docs: DataFrame, evalset: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  broadcast_eval: bool = True) -> DataFrame:
    """``docs`` minus every contaminated document (left-anti join on the
    flagged id set — the id set is tiny relative to the corpus, so AQE
    plans it broadcast)."""
    hits = find_contaminated(docs, evalset, n, text_col, id_col,
                             eval_text_col, broadcast_eval)
    return docs.join(hits.select(id_col), id_col, "left_anti")
