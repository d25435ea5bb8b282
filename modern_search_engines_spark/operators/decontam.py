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
