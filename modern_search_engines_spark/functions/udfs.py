"""Vectorized pandas/Arrow UDFs — the only Python in the hot path
(BASELINE.json input_hint: "no per-row Python").

Each UDF wraps the shared spec-as-code from ``textlib``/``htmlx`` so the
distributed output is byte-identical to the single-node oracle. Everything
else in the engine is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd).

UDF inventory (SURVEY.md §2.9):
  extract_udf      P1-P9  HTML → struct (bs4-semantics extraction)
  index_tokens_udf T1/T5  1..3-gram multiset + title/heading/emphasis sets
  simhash_udf      T6     128-bit simhash → two longs
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import htmlx, textlib

# ---------------------------------------------------------------------------
# Extraction (reference Document.py:66-96; P1-P9 in SURVEY.md §2.2)
# ---------------------------------------------------------------------------

EXTRACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("icon_url", T.StringType()),
    T.StructField("last_modified", T.TimestampType()),
    T.StructField("headings", T.MapType(T.StringType(),
                                        T.ArrayType(T.StringType()))),
    T.StructField("text_emphasis", T.MapType(T.StringType(),
                                             T.ArrayType(T.StringType()))),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("anchor_pairs", T.ArrayType(T.StructType([
        T.StructField("href", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ]))),
    T.StructField("text", T.StringType()),
    T.StructField("single_tokens", T.ArrayType(T.StringType())),
    T.StructField("language", T.StringType()),
    T.StructField("html_lang", T.StringType()),
])


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """HTML → full extraction struct (Arrow-batched).

    Semantics: /root/reference/backend/core/Document.py:66-96 via the
    shared ``htmlx.extract_page`` + ``textlib`` routines. ``doc_id`` is
    md5(url) hex (Document.py:22).
    """
    rows = []
    for u, h in zip(url, html):
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", errors="replace")
        ex = htmlx.extract_page(u, h)
        single = textlib.tokenize(ex["text"], 1)
        html_lang = ex["html_lang"]
        lang = textlib.detect_document_language(single, html_lang)
        rows.append({
            "doc_id": hashlib.md5(u.encode("utf-8")).hexdigest(),
            "title": ex["title"],
            "description": ex["description"],
            "keywords": ex["keywords"],
            "icon_url": ex["icon_url"],
            "last_modified": ex["last_modified"],
            "headings": ex["headings"],
            "text_emphasis": ex["text_emphasis"],
            "links": ex["links"],
            "anchor_pairs": [{"href": h, "anchor": a}
                             for h, a in ex["anchor_pairs"]],
            "text": ex["text"],
            "single_tokens": single,
            "language": lang,
            "html_lang": html_lang,
        })
    return pd.DataFrame(rows, columns=[f.name for f in EXTRACT_SCHEMA])


# ---------------------------------------------------------------------------
# Index tokenization (reference DocumentIndex.py:112-141; T1/T5)
# ---------------------------------------------------------------------------

HEADING_LEVELS = ("h1", "h2", "h3", "h4", "h5", "h6")
EMPHASIS_CLASSES = ("bold", "italic", "underline", "strike")

INDEX_TOKENS_SCHEMA = T.StructType([
    # cleaned re-tokenized unigrams (DocumentIndex.py:120); the 1..n-gram
    # multiset is derived JVM-side (indexing.index_terms_col) — n-grams
    # are pure space-joins of these, so materializing them in parquet
    # would be 6x storage for zero information
    T.StructField("doc_unigrams", T.ArrayType(T.StringType())),
    T.StructField("title_unigrams", T.ArrayType(T.StringType())),
    # membership sets for the BM25 field weights (BM25Ranker.py:28-42)
    T.StructField("title_terms", T.ArrayType(T.StringType())),
    T.StructField("heading_terms",
                  T.ArrayType(T.ArrayType(T.StringType()))),   # per h1..h6
    T.StructField("emphasis_terms",
                  T.ArrayType(T.ArrayType(T.StringType()))),   # per class
])


def make_index_tokens_udf(ngram_max: int = 3):
    @F.pandas_udf(INDEX_TOKENS_SCHEMA)
    def index_tokens_udf(single_tokens: pd.Series, title: pd.Series,
                         headings: pd.Series,
                         text_emphasis: pd.Series) -> pd.DataFrame:
        rows = []
        for toks, ttl, hmap, emap in zip(single_tokens, title,
                                         headings, text_emphasis):
            toks = list(toks) if toks is not None else []
            # re-tokenize (DocumentIndex.py:120); unigrams only — the
            # 1..n-gram expansion happens JVM-side and is exactly
            # ngrams(unigrams, 1..n) by construction (textlib.tokenize)
            doc_unigrams = (textlib.tokenize(" ".join(toks), 1)
                            if ngram_max > 1 else list(toks))
            title_unigrams: list[str] = []
            title_terms: list[str] = []
            if ttl:
                title_unigrams = textlib.tokenize(ttl, 1)
                title_terms = textlib.tokenize(ttl, ngram_max)
            hmap = dict(hmap) if hmap is not None else {}
            emap = dict(emap) if emap is not None else {}
            heading_terms = []
            for lvl in HEADING_LEVELS:
                s: set[str] = set()
                for h in hmap.get(lvl) or []:
                    s.update(textlib.tokenize(h, ngram_max))
                heading_terms.append(sorted(s))
            emphasis_terms = []
            for cls in EMPHASIS_CLASSES:
                s = set()
                for e in emap.get(cls) or []:
                    s.update(textlib.tokenize(e, ngram_max))
                emphasis_terms.append(sorted(s))
            rows.append({
                "doc_unigrams": doc_unigrams,
                "title_unigrams": title_unigrams,
                "title_terms": sorted(set(title_terms)),
                "heading_terms": heading_terms,
                "emphasis_terms": emphasis_terms,
            })
        return pd.DataFrame(rows,
                            columns=[f.name for f in INDEX_TOKENS_SCHEMA])

    return index_tokens_udf


# ---------------------------------------------------------------------------
# SimHash (reference Document.py:155-180; T6)
# ---------------------------------------------------------------------------

SIMHASH_SCHEMA = T.StructType([
    T.StructField("sim_hi", T.LongType()),
    T.StructField("sim_lo", T.LongType()),
])


@F.pandas_udf(SIMHASH_SCHEMA)
def simhash_udf(single_tokens: pd.Series) -> pd.DataFrame:
    rows = []
    for toks in single_tokens:
        h = textlib.simhash128(list(toks) if toks is not None else [])
        hi, lo = textlib.simhash_to_longs(h)
        rows.append({"sim_hi": hi, "sim_lo": lo})
    return pd.DataFrame(rows, columns=["sim_hi", "sim_lo"])


# ---------------------------------------------------------------------------
# Fused extraction pass (extract + index-tokens + simhash in ONE
# mapInPandas). Chaining the three pandas UDFs costs one python worker
# AND one Arrow round-trip of the wide token arrays per UDF per task;
# fusing them runs exactly one python worker per task slot and
# serializes the extracted row once (measured ~1.5x on the extraction
# stage, and makes task-slot CPU accounting ~2 threads/slot — the basis
# for the bench's core-sizing).
# ---------------------------------------------------------------------------

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("icon_url", T.StringType()),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("headings", T.MapType(T.StringType(),
                                            T.ArrayType(T.StringType()))),
        T.StructField("text_emphasis", T.MapType(T.StringType(),
                                                 T.ArrayType(T.StringType()))),
        T.StructField("links", T.ArrayType(T.StringType())),
        # per-occurrence (href, anchor text) — collected in the SAME
        # html parse as everything else so the anchor-field stage is a
        # column read, never a second parse of the corpus' html
        T.StructField("anchor_pairs", T.ArrayType(T.StructType([
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]))),
        T.StructField("text", T.StringType()),
        T.StructField("single_tokens", T.ArrayType(T.StringType())),
        T.StructField("language", T.StringType()),
        T.StructField("doc_unigrams", T.ArrayType(T.StringType())),
        T.StructField("title_unigrams", T.ArrayType(T.StringType())),
        T.StructField("title_terms", T.ArrayType(T.StringType())),
        T.StructField("heading_terms",
                      T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("emphasis_terms",
                      T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("sim_hi", T.LongType()),
        T.StructField("sim_lo", T.LongType()),
    ]
)

_EXTRACTED_COLS = [f.name for f in EXTRACTED_SCHEMA]


def extract_document(url: str, html: str, ngram_max: int = 3) -> dict:
    """One page → one fully-extracted row (pure; shared spec-as-code)."""
    ex = htmlx.extract_page(url, html)
    single = textlib.tokenize(ex["text"], 1)
    lang = textlib.detect_document_language(single, ex["html_lang"])

    doc_unigrams = (textlib.tokenize(" ".join(single), 1)
                    if ngram_max > 1 else list(single))
    ttl = ex["title"]
    title_unigrams = textlib.tokenize(ttl, 1) if ttl else []
    title_terms = sorted(set(
        textlib.tokenize(ttl, ngram_max))) if ttl else []
    heading_terms = []
    for lvl in HEADING_LEVELS:
        s: set[str] = set()
        for h in ex["headings"].get(lvl) or []:
            s.update(textlib.tokenize(h, ngram_max))
        heading_terms.append(sorted(s))
    emphasis_terms = []
    for cls in EMPHASIS_CLASSES:
        s = set()
        for e in ex["text_emphasis"].get(cls) or []:
            s.update(textlib.tokenize(e, ngram_max))
        emphasis_terms.append(sorted(s))
    sim = textlib.simhash128(single)
    hi, lo = textlib.simhash_to_longs(sim)
    return {
        "url": url,
        "doc_id": hashlib.md5(url.encode("utf-8")).hexdigest(),
        "title": ex["title"],
        "description": ex["description"],
        "keywords": ex["keywords"],
        "icon_url": ex["icon_url"],
        "last_modified": ex["last_modified"],
        "headings": ex["headings"],
        "text_emphasis": ex["text_emphasis"],
        "links": ex["links"],
        "anchor_pairs": [{"href": h, "anchor": a}
                         for h, a in ex["anchor_pairs"]],
        "text": ex["text"],
        "single_tokens": single,
        "language": lang,
        "doc_unigrams": doc_unigrams,
        "title_unigrams": title_unigrams,
        "title_terms": title_terms,
        "heading_terms": heading_terms,
        "emphasis_terms": emphasis_terms,
        "sim_hi": hi,
        "sim_lo": lo,
    }


def make_extract_full_fn(ngram_max: int = 3):
    """mapInPandas body: (url, warc_ts, html) batches → extracted rows."""

    def run(batches):
        for pdf in batches:
            rows = []
            for u, ts, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", errors="replace")
                row = extract_document(u, h, ngram_max)
                row["warc_ts"] = ts
                rows.append(row)
            yield pd.DataFrame(rows, columns=_EXTRACTED_COLS)

    return run


# ---------------------------------------------------------------------------
# Document tokenizer as a standalone UDF (for ad-hoc text pipelines)
# ---------------------------------------------------------------------------

def make_tokenize_udf(ngram_max: int = 1):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: textlib.tokenize(t or "", ngram_max))

    return tokenize_udf
