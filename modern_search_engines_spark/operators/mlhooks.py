"""Pluggable ML hooks: doc2query expansion + abstractive summarization.

The reference wires two heavyweight seq2seq models into its pipeline:

* doc2query (``/root/reference/backend/core/Doc2Query.py:7-21``) — a
  pyterrier T5 generator (num_samples=4, ElectraScorer, QueryFilter
  t=0.1234, append=False, GPU batch_size=64) whose generated queries are
  tokenized and appended to each document's ``single_tokens`` before
  indexing (``DocumentIndex.py:60-66``).
* summarizer (``/root/reference/backend/SearchEngineServer/api/
  Summarizer.py:5-21``) — facebook/bart-large-cnn with max_length=300,
  min_length=50, num_beams=4, served behind ``/summarize``.

Neither model ships in this container, so — exactly like
``operators/multimodal.py`` — the model call is a pluggable hook with a
deterministic fake default: the Spark plumbing (Arrow batching, schema,
column flow, the append-to-tokens contract) is real and tested, and a
deployment swaps in the real model with ``set_query_generator`` /
``set_summarizer`` without touching the dataflow.

Scale notes: both hooks are map-only stages over Arrow batches — the
natural shape for GPU micro-batching too (the reference's batch_size=64
becomes the Arrow batch) — and neither shuffles; expansion happens
BEFORE the tf aggregation so generated terms flow through the normal
index build unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .. import textlib

NUM_SAMPLES = 4          # Doc2Query.py:7
SUMMARY_MAX_WORDS = 300  # Summarizer.py max_length
SUMMARY_MIN_WORDS = 50   # Summarizer.py min_length


# ---------------------------------------------------------------------------
# doc2query
# ---------------------------------------------------------------------------

def _fake_query_generator(text: str, num_samples: int = NUM_SAMPLES
                          ) -> list[str]:
    """Deterministic stand-in for the T5 generator: builds pseudo-queries
    from the document's most frequent non-stopword tokens (stable order:
    count desc, token asc)."""
    counts: dict[str, int] = {}
    for tok in textlib.word_tokenize(textlib.normalize_tuebingen(
            (text or "").lower())):
        if tok.isalnum() and tok not in textlib.ENGLISH_STOPWORDS:
            counts[tok] = counts.get(tok, 0) + 1
    ranked = sorted(counts, key=lambda t: (-counts[t], t))
    return [" ".join(ranked[i:i + 3]) for i in range(0, min(
        len(ranked), 3 * num_samples), 3)]


_query_generator: Callable[[str], list[str]] = _fake_query_generator


def set_query_generator(fn: Callable[[str], list[str]]) -> None:
    """Plug in a real doc2query model (text → generated queries)."""
    global _query_generator
    _query_generator = fn


def real_query_generator(text: str) -> list[str]:
    """The production hook — pyterrier/T5 is absent in this container."""
    raise NotImplementedError(
        "doc2query T5 model is not available in this environment; "
        "call set_query_generator() with a real implementation")


def doc2query_expand(extracted: DataFrame,
                     text_col: str = "text",
                     tokens_col: str = "single_tokens") -> DataFrame:
    """Append tokenized generated-query terms to ``tokens_col`` — the
    STANDALONE variant (contract/demo over a bare tokens column).

    For the index build use :func:`expand_for_index`, which also extends
    ``doc_unigrams`` — the column ``build_tf`` actually consumes — so
    expansions reach tf/df/postings. This function alone, run between
    extraction and build_tf, would leave the index unchanged (the fused
    extraction UDF derives doc_unigrams before the hook runs).
    Arrow-batched pandas UDF; map-only, no shuffle.
    """
    gen = _query_generator

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def expansion(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks: list[str] = []
            for q in gen(text or ""):
                toks.extend(textlib.tokenize(q, ngram_max=1))
            out.append(toks)
        return pd.Series(out)

    return extracted.withColumn(
        tokens_col, F.concat(F.col(tokens_col), expansion(F.col(text_col))))


_EXPANSION_STRUCT = T.StructType([
    T.StructField("exp_single", T.ArrayType(T.StringType())),
    T.StructField("exp_unigrams", T.ArrayType(T.StringType())),
])


def expand_for_index(extracted: DataFrame, ngram_max: int = 3) -> DataFrame:
    """Build-integrated doc2query (``DocumentIndex.py:47-66`` +
    ``Doc2Query.py:11-21``), for extracted rows carrying
    (text, single_tokens, doc_unigrams):

    * generated queries are tokenized with the FULL document tokenizer
      (1..ngram_max grams, exactly ``tokenize(row['querygen'], ngrams)``,
      Doc2Query.py:21) and appended to ``single_tokens``;
    * ``doc_unigrams`` is extended with the cleaned re-tokenization of
      the joined expansion tokens, so the downstream n-gram expansion
      over doc_unigrams (build_tf/index_terms_col) is byte-identical to
      the reference's re-tokenize of ``' '.join(single_tokens)``
      (DocumentIndex.py:121) — including its quirks: n-gram expansion
      tokens re-split into duplicate unigrams, and cross-boundary
      n-grams between document text, query expansions, and adjacent
      generated queries.

    Must run AFTER corpus_stats (the reference computes avgdl before
    doc2query, DocumentIndex.py:50-62 — expansions never affect avgdl)
    and BEFORE build_tf. Map-only Arrow stage, no shuffle — the natural
    GPU micro-batch shape for a real T5 generator.
    """
    gen = _query_generator

    @F.pandas_udf(_EXPANSION_STRUCT)
    def expansion(texts: pd.Series) -> pd.DataFrame:
        singles, unigrams = [], []
        for text in texts:
            querygen = "\n".join(gen(text or ""))
            exp_single = textlib.tokenize(querygen, ngram_max)
            singles.append(exp_single)
            unigrams.append(textlib.tokenize(" ".join(exp_single), 1))
        return pd.DataFrame(
            {"exp_single": singles, "exp_unigrams": unigrams})

    return (extracted
            .withColumn("_exp", expansion(F.col("text")))
            .withColumn("single_tokens",
                        F.concat("single_tokens", "_exp.exp_single"))
            .withColumn("doc_unigrams",
                        F.concat("doc_unigrams", "_exp.exp_unigrams"))
            .drop("_exp"))


# ---------------------------------------------------------------------------
# summarizer
# ---------------------------------------------------------------------------

def _fake_summarizer(text: str) -> str:
    """Deterministic extractive stand-in for BART: leading sentences,
    cut at the first sentence boundary past SUMMARY_MIN_WORDS words and
    hard-capped at SUMMARY_MAX_WORDS words."""
    words_out: list[str] = []
    for sentence in (text or "").replace("!", ".").replace("?", ".")\
            .split("."):
        ws = sentence.split()
        if not ws:
            continue
        words_out.extend(ws)
        if len(words_out) >= SUMMARY_MIN_WORDS:
            break
    return " ".join(words_out[:SUMMARY_MAX_WORDS])


_summarizer: Callable[[str], str] = _fake_summarizer


def set_summarizer(fn: Callable[[str], str]) -> None:
    """Plug in a real abstractive summarizer (text → summary)."""
    global _summarizer
    _summarizer = fn


def real_summarizer(text: str) -> str:
    """The production hook — BART is absent in this container."""
    raise NotImplementedError(
        "BART summarizer is not available in this environment; "
        "call set_summarizer() with a real implementation")


def summarize(docs: DataFrame, text_col: str = "text",
              out_col: str = "summary") -> DataFrame:
    """Add a ``summary`` column via the pluggable hook (Arrow-batched)."""
    summ = _summarizer

    @F.pandas_udf(T.StringType())
    def s(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: summ(t or ""))

    return docs.withColumn(out_col, s(F.col(text_col)))
