"""Corpus-level LINE deduplication (C4-style) — remove every repeated
line/paragraph across the whole corpus, keeping exactly the FIRST
occurrence (by (doc_id, line_idx) order), then reassemble documents.

This is the sixth member of the dedup family (exact / minhash / simhash
/ jaccard / embedding work at DOCUMENT granularity; this one works at
LINE granularity — the C4/CCNet "discard duplicate lines" rule that
removes boilerplate navigation, cookie banners and licence footers from
web text). The reference engine has no analog; the operator exists for
the training-data-pipeline surface of this repo.

Scale shape (the part that matters at 100 TB):

* lines are keyed by ``md5(line)`` (16-byte binary), not the line text,
  so the two shuffles move a fixed-width key instead of arbitrary-length
  strings (collision risk 2^-128 — documented, same stance as the
  posting-merge and exact-dedup operators).
* first-occurrence selection is a ``min(struct(doc_id, idx))``
  **aggregation**, not a window: partial aggregation (map-side combine)
  collapses hot lines (an empty line or a boilerplate footer appearing
  in 10^9 docs) to one row per map task before the shuffle. A
  ``row_number() OVER (PARTITION BY line)`` window — the obvious
  alternative — would sort each hot line's 10^9 rows in ONE task.
* the join back from lines to their winning occurrence is keyed by the
  same md5, so AQE's skew-join splitting applies; the winners side
  carries only (md5, doc_id, idx).
* reassembly is one groupBy(doc_id) with ``sort_array(collect_list)``
  — per-doc line counts are bounded by doc size, never by corpus size.

Three shuffles total (line-key agg, line-key join, doc-key reassembly);
none is avoidable without bucketed inputs — with documents pre-bucketed
by doc_id the third collapses to a local sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def split_lines_expr(text_col: Column, sep: str = "\n") -> Column:
    """text → array of lines, empties dropped (an empty line is format,
    not content — C4 drops them before the dedup decision)."""
    return F.filter(F.split(text_col, sep), lambda x: x != "")


def chunk_tokens_expr(text_col: Column, chunk: int) -> Column:
    """text → array of fixed-``chunk``-token pseudo-lines (whitespace
    tokens re-joined by single spaces). For corpora whose documents
    carry no newline structure (the synthetic `documents` table), fixed
    windows are the line analog; real web text uses ``split_lines_expr``."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda j: F.concat_ws(
                        " ", F.slice(toks, j * chunk + 1, chunk))),
    ).otherwise(F.array().cast("array<string>"))


def line_dedup(docs: DataFrame, lines_expr: Column | None = None,
               id_col: str = "doc_id", text_col: str = "text",
               sep: str = "\n") -> DataFrame:
    """(id, clean_text, n_lines, n_kept) — corpus-wide line dedup.

    ``lines_expr``: how a document becomes lines (defaults to
    ``split_lines_expr(text, sep)``; pass ``chunk_tokens_expr(...)`` for
    token-window pseudo-lines). A line is KEPT iff this occurrence is
    the corpus-wide first by (doc_id, idx); every other occurrence is
    dropped and the document re-joined from its survivors in original
    order. Docs whose every line is dropped (and 0-line docs) stay in
    the output with ``clean_text = ''``.
    """
    if lines_expr is None:
        lines_expr = split_lines_expr(F.col(text_col), sep)
    lines = (docs
             .select(F.col(id_col).alias("did"),
                     F.posexplode(lines_expr).alias("idx", "line"))
             .withColumn("lkey", F.md5(F.col("line").cast("binary"))
                         .alias("lkey")))
    # corpus-wide first occurrence per line key: min-struct AGGREGATION
    # (map-side combinable — see module docstring for why not a window)
    winners = (lines.groupBy("lkey")
               .agg(F.min(F.struct("did", "idx")).alias("w")))
    kept = (lines.join(winners, "lkey")
            .where((F.col("did") == F.col("w.did"))
                   & (F.col("idx") == F.col("w.idx"))))
    stats = (lines.groupBy("did")
             .agg(F.count(F.lit(1)).alias("n_lines")))
    rebuilt = (kept.groupBy("did")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.concat_ws(
                        sep,
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("idx", "line"))),
                            lambda s: s["line"])).alias("clean_text")))
    return (docs.select(F.col(id_col).alias("did"))
            .join(stats, "did", "left")
            .join(rebuilt, "did", "left")
            .select(F.col("did").alias(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines", F.lit(0)).cast("long")
                    .alias("n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept")))
