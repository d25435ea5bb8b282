"""Per-document quality metrics for corpus filtering — the text-analysis
family of a training-data pipeline (round brief: language-ID heuristic,
quality scoring, token counting, repetition).

Everything here is a pure JVM column expression (higher-order functions
over a token array) — no Python in the row path, so the metrics run
inside whole-stage codegen and scale linearly with the corpus. The same
expressions back the standalone contract entries (text_quality,
lang_id_heuristic, text_repetition) and the staged cleaning pipeline
(plans/clean.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny embedded samples — enough signal for a heuristic gate; real
# deployments swap in the full public stopword lists (textlib.py embeds
# the complete NLTK English list for the search engine's tokenizer)
EN_STOPWORD_SAMPLE = ("the", "a", "and", "of", "in", "to", "is")
DE_STOPWORD_SAMPLE = ("der", "die", "das", "und", "ist", "mit", "von")


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def trigrams_expr(toks: Column) -> Column:
    """Word-trigram array ([] when < 3 tokens)."""
    return F.when(
        F.size(toks) >= 3,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 3))),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio_expr(toks: Column,
                        stopwords=EN_STOPWORD_SAMPLE) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # zero-token docs → 0.0, not DIVIDE_BY_ZERO (ANSI mode is on in
    # Spark 4; the cleaning pipeline must survive exactly the empty docs
    # it exists to filter out)
    return F.when(F.size(toks) > 0,
                  F.round(n_sw.cast("double") / F.size(toks), 6)
                  ).otherwise(F.lit(0.0))


def avg_token_len_expr(toks: Column) -> Column:
    total_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                            F.lit(0), lambda acc, v: acc + v)
    return F.when(F.size(toks) > 0,
                  F.round(total_len.cast("double") / F.size(toks), 6)
                  ).otherwise(F.lit(0.0))


def repetition_ratio_expr(toks: Column) -> Column:
    """Fraction of duplicated word-trigrams (0 when < 3 tokens) — high
    values flag boilerplate/spam."""
    tg = trigrams_expr(toks)
    total = F.size(tg)
    return F.when(
        total > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(tg))
                .cast("double") / total, 6)).otherwise(F.lit(0.0))


def lang_guess_expr(toks: Column) -> Column:
    """en-vs-de stopword-hit vote (ties → en)."""
    en = F.array(*[F.lit(s) for s in EN_STOPWORD_SAMPLE])
    de = F.array(*[F.lit(s) for s in DE_STOPWORD_SAMPLE])
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_de = F.size(F.filter(toks, lambda t: F.array_contains(de, t)))
    return F.when(n_en >= n_de, F.lit("en")).otherwise(F.lit("de"))


def doc_quality(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, text_md5, n_tokens, stopword_ratio, avg_token_len,
    rep_ratio, lang_guess) — every per-doc metric in ONE scan/projection
    (the token array is materialized once and shared by all metrics)."""
    d = docs.select(F.col(id_col),
                    F.md5(F.col(text_col).cast("binary")).alias("text_md5"),
                    tokens_expr(text_col).alias("toks"))
    toks = F.col("toks")
    return d.select(
        id_col, "text_md5",
        F.size(toks).cast("long").alias("n_tokens"),
        stopword_ratio_expr(toks).alias("stopword_ratio"),
        avg_token_len_expr(toks).alias("avg_token_len"),
        repetition_ratio_expr(toks).alias("rep_ratio"),
        lang_guess_expr(toks).alias("lang_guess"),
    )
