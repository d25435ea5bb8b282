"""C4-style page/line cleaning rules (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning with a Unified Text-to-Text Transformer",
§2.2) — the classic web-text curation gate that precedes every modern
pretraining corpus (C4 → MassiveWeb → RefinedWeb → FineWeb all keep a
variant of these rules).

Line rules (shape the KEPT text):
  * keep only lines ending in a terminal punctuation mark
    (``. ! ?`` optionally followed by a closing quote);
  * keep only lines with at least ``min_words_per_line`` words;
  * drop any line containing the word "javascript" (case-insensitive).

Page rules (set ``keep``/``fail_reason``; the document set is preserved
— flag, don't drop — so the caller can filter, stratify, or audit):
  * drop pages containing "lorem ipsum" (case-insensitive);
  * drop pages containing a curly brace ``{`` (code leakage);
  * drop pages containing any token on the bad-words list (the paper
    uses the public "List of Dirty, Naughty, Obscene..." list; the
    embedded default is a tiny spam-word stand-in — swap the real list
    in via ``banned_words``);
  * drop pages whose KEPT text has fewer than ``min_sentences``
    sentences (sentence ≈ terminal-punctuation-delimited segment).

Paper rules intentionally NOT here: the langdetect English gate
(``quality.lang_guess_expr`` is this repo's language-ID stand-in) and
the Wikipedia citation-marker strip (a one-line ``regexp_replace``,
markup-specific).

100-TB shape: everything is a pure JVM column expression over one
line-array projection — a map-only pass, zero shuffle, whole-stage
codegen end to end, exactly like ``quality.gopher_quality_filter``.
``fail_reason`` names the FIRST failing page rule in the fixed order
(lorem_ipsum, brace, bad_word, n_sentences) or NULL when the page
passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# terminal punctuation, optionally followed by one closing quote — the
# paper's "period, exclamation mark, question mark, or end quotation
# mark"
TERMINAL_PUNCT_RE = '[.!?]["”\']?$'
# sentence counter: every terminal punct mark in the kept text ends one
# sentence (split yields segments; segments-1 = marks)
SENTENCE_SPLIT_RE = "[.!?]"

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
# stand-in for the public bad-words list (spam terms, not slurs — the
# real deployment vendors the full public list)
BAD_WORD_SAMPLE = ("casino", "viagra", "xxx")


def lines_expr(text_col: str = "text") -> Column:
    """text → array of non-empty lines."""
    return F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")


def kept_lines_expr(lines: Column,
                    min_words_per_line: int = C4_MIN_WORDS_PER_LINE
                    ) -> Column:
    """The three line rules as one array filter."""
    def _keep(line: Column) -> Column:
        words = F.filter(F.split(line, " "), lambda w: w != "")
        return (line.rlike(TERMINAL_PUNCT_RE)
                & (F.size(words) >= min_words_per_line)
                & ~F.lower(line).contains("javascript"))
    return F.filter(lines, _keep)


def c4_quality_filters(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
                       min_sentences: int = C4_MIN_SENTENCES,
                       banned_words=BAD_WORD_SAMPLE,
                       with_text: bool = False) -> DataFrame:
    """(id, n_lines, n_lines_kept, n_sentences, keep, fail_reason,
    clean_md5) — C4 cleaning pass; ``clean_md5`` hashes the kept lines
    re-joined by newline (the text a downstream stage would train on).
    ``with_text=True`` appends that text itself as ``clean_text`` (the
    curation pipeline consumes it; the contract twin hashes the md5)."""
    lines = lines_expr(text_col)
    d = docs.select(F.col(id_col), F.col(text_col).alias("__t"),
                    lines.alias("__lines"),
                    kept_lines_expr(lines, min_words_per_line)
                    .alias("__kept"))
    clean = F.concat_ws("\n", F.col("__kept"))
    # segments-1 == number of terminal marks in the kept text; an empty
    # clean text splits to [''] and correctly yields 0
    n_sent = F.size(F.split(clean, SENTENCE_SPLIT_RE)) - 1
    low = F.lower(F.col("__t"))
    banned = F.array(*[F.lit(w) for w in banned_words])
    toks = F.filter(F.split(low, r"\s+"), lambda w: w != "")
    has_bad = F.exists(toks, lambda w: F.array_contains(banned, w))
    reason = (
        F.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(F.col("__t").contains("{"), F.lit("brace"))
        .when(has_bad, F.lit("bad_word"))
        .when(n_sent < min_sentences, F.lit("n_sentences"))
        .otherwise(F.lit(None).cast("string")))
    cols = [
        F.col(id_col),
        F.size("__lines").cast("long").alias("n_lines"),
        F.size("__kept").cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
        F.md5(clean.cast("binary")).alias("clean_md5")]
    if with_text:
        cols.append(clean.alias("clean_text"))
    return d.select(*cols)
