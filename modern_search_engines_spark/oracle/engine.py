"""Single-node oracle engine — faithful reimplementation of the reference's
index + scoring semantics, used as the parity target for the Spark engine
(SURVEY.md §5, BASELINE.md "BM25 rank parity").

Semantics re-expressed (NOT copied) from
``/root/reference/backend/core/DocumentIndex.py:47-170`` and
``/root/reference/backend/core/BM25Ranker.py:18-61`` with every quirk
preserved:

* avgdl is the mean *unigram* count (DocumentIndex.py:95-110) while BM25's
  per-doc length is the full 1..3-gram + title-token multiset sum
  (BM25Ranker.py:21) — the deliberate unit mismatch (SURVEY.md A5 vs A7).
* title tokens are appended to the doc token multiset (DocumentIndex.py:120-124).
* field weights compound: ×2 title, ×1.6 per heading level containing the
  term, ×1.2 per emphasis class (BM25Ranker.py:28-42).
* recency exp(−0.008·days) with integer-floor day age and missing dates
  imputed with the corpus average date (BM25Ranker.py:44-47,
  DocumentIndex.py:116); ``now`` is pinned for reproducibility.
* OR-semantics score accumulation over query terms, term multiplicity
  counted (BM25Ranker.py:49-61); n-gram weight exp(0.29·n−0.336).
* idf = ln(N/df) (DocumentIndex.py:143-145); tfidf = tf·idf; query-side
  tfidf = qtf·idf; tfidf score = Σ q·d (DocumentIndex.py:147-170).
* deterministic tie-break (score desc, doc_id asc) replaces the reference's
  insertion-order-stable sort (DocumentIndex.py:198-199) — documented
  divergence (SURVEY.md §4.4).
"""

from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass, field

from .. import htmlx, textlib

K1 = 1.5
B = 0.75
RECENCY_LAMBDA = 0.008

# Pinned "now" for the recency term (BM25Ranker.py:19 uses wall-clock —
# irreproducible; we pin it as a build parameter, SURVEY.md §4.5).
PINNED_NOW = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


@dataclass
class OracleDoc:
    url: str
    doc_id: str            # md5(url) hex (Document.py:22)
    title: str
    single_tokens: list[str]
    headings: dict[str, list[str]]
    text_emphasis: dict[str, list[str]]
    last_modified: dt.datetime | None
    language: str | None
    text: str = ""
    extras: dict = field(default_factory=dict)


def doc_from_page(url: str, html: str) -> OracleDoc:
    """Extraction + tokenization path of Document.__fetch_document_content."""
    import hashlib
    ex = htmlx.extract_page(url, html)
    single = textlib.tokenize(ex["text"], 1)
    lang = textlib.detect_document_language(single, ex["html_lang"])
    return OracleDoc(
        url=url,
        doc_id=hashlib.md5(url.encode("utf-8")).hexdigest(),
        title=ex["title"],
        single_tokens=single,
        headings=ex["headings"],
        text_emphasis=ex["text_emphasis"],
        last_modified=ex["last_modified"],
        language=lang,
        text=ex["text"],
        extras=ex,
    )


def _html_lang(html: str) -> str | None:
    root = htmlx.parse_html(html)
    tag = root.find("html")
    if tag is not None:
        return tag.attrs.get("lang")
    return None


class OracleEngine:
    """In-memory index with reference semantics; the Spark parity target."""

    def __init__(self, ngram_max: int = 3, now: dt.datetime = PINNED_NOW):
        self.ngram_max = ngram_max
        self.now = now
        self.total_documents = 0
        self.avg_doc_length = 0.0
        self.avg_doc_date: dt.datetime | None = None
        self.tf: dict[str, dict[str, int]] = {}
        self.df: dict[str, int] = {}
        self.idf: dict[str, float] = {}
        self.tfidf: dict[str, dict[str, float]] = {}
        self.inverted_index: dict[str, set[str]] = {}
        self.doc_meta: dict[str, dict] = {}
        self.bm25_doc_term: dict[str, dict[str, float]] = {}

    # -- build (DocumentIndex.create_index_for_documents, :47-73) ----------

    def build(self, docs: list[OracleDoc],
              use_doc2query: bool = False) -> None:
        docs = [
            d for d in docs
            if textlib.index_filter(
                d.url,
                textlib.is_relevant(d.url, d.language, d.single_tokens),
                d.single_tokens,
            )
        ]
        # averages BEFORE doc2query (DocumentIndex.py:50-62): avgdl never
        # includes expansion tokens
        self._averages(docs)
        self.total_documents = len(docs)
        if use_doc2query:
            docs = self._doc2query(docs)
        for d in docs:
            self._add(d)
        self._idf_tfidf()
        self._bm25()

    def _doc2query(self, docs: list[OracleDoc]) -> list[OracleDoc]:
        """doc_2_query_minus (Doc2Query.py:11-21): generated queries are
        tokenized with the build's n-gram setting and appended to
        ``single_tokens``; ``_add``'s re-tokenization then folds them
        into tf/df. Returns expanded COPIES (the reference mutates its
        docs in place, but mutating the caller's objects would
        double-apply expansions if the same docs are built twice)."""
        import dataclasses

        from ..operators import mlhooks
        out = []
        for d in docs:
            querygen = "\n".join(mlhooks._query_generator(d.text or ""))
            out.append(dataclasses.replace(
                d, single_tokens=d.single_tokens
                + textlib.tokenize(querygen, self.ngram_max)))
        return out

    def _averages(self, docs: list[OracleDoc]) -> None:
        # unigram avgdl + mean date over dated docs (DocumentIndex.py:95-110)
        total_ts, dated, total_len = 0.0, 0, 0
        for d in docs:
            total_len += len(d.single_tokens)
            if d.last_modified is not None:
                total_ts += d.last_modified.timestamp()
                dated += 1
        if dated:
            self.avg_doc_date = dt.datetime.fromtimestamp(
                total_ts / dated, tz=dt.timezone.utc)
        self.avg_doc_length = total_len / len(docs) if docs else 0.0

    def _add(self, d: OracleDoc) -> None:
        # re-tokenize to 1..n-grams, append title tokens
        # (DocumentIndex.py:112-141)
        tokens = (textlib.tokenize(" ".join(d.single_tokens), self.ngram_max)
                  if self.ngram_max > 1 else list(d.single_tokens))
        meta: dict = {
            "date": d.last_modified if d.last_modified is not None
            else self.avg_doc_date,
            "headings": {}, "text_emphasis": {},
        }
        if d.title:
            title_tokens = textlib.tokenize(d.title, self.ngram_max)
            meta["title"] = title_tokens
            tokens.extend(title_tokens)

        tf = self.tf.setdefault(d.doc_id, {})
        for t in tokens:
            tf[t] = tf.get(t, 0) + 1
        for t in set(tokens):
            self.df[t] = self.df.get(t, 0) + 1
            self.inverted_index.setdefault(t, set()).add(d.doc_id)

        for tag, hs in d.headings.items():
            s: set[str] = set()
            for h in hs:
                s.update(textlib.tokenize(h, self.ngram_max))
            meta["headings"][tag] = s
        for tag, es in d.text_emphasis.items():
            s = set()
            for e in es:
                s.update(textlib.tokenize(e, self.ngram_max))
            meta["text_emphasis"][tag] = s
        self.doc_meta[d.doc_id] = meta

    def _idf_tfidf(self) -> None:
        for term, c in self.df.items():
            self.idf[term] = math.log(self.total_documents / c)
        for doc_id, terms in self.tf.items():
            self.tfidf[doc_id] = {
                t: c * self.idf[t] for t, c in terms.items()
            }

    def _bm25(self) -> None:
        # BM25Ranker.calculate_bm25_doc_term (:18-26)
        for doc_id, terms in self.tf.items():
            doc_len = sum(terms.values())  # full multiset (quirk A7)
            meta = self.doc_meta[doc_id]
            time_w = self._recency(meta["date"])
            out: dict[str, float] = {}
            for term, tf in terms.items():
                w = self._field_weight(term, meta)
                frac = (tf * (K1 + 1)) / (
                    tf + K1 * (1 - B + B * (doc_len / self.avg_doc_length)))
                out[term] = time_w * w * self.idf[term] * frac
            self.bm25_doc_term[doc_id] = out

    def _field_weight(self, term: str, meta: dict) -> float:
        # compounding weights (BM25Ranker.py:28-42)
        w = 1.0
        if "title" in meta and term in meta["title"]:
            w *= 2
        for h in meta["headings"].values():
            if term in h:
                w *= 1.6
        for e in meta["text_emphasis"].values():
            if term in e:
                w *= 1.2
        return w

    def _recency(self, date: dt.datetime | None) -> float:
        # exp(−λ·days), integer-floor timedelta days (BM25Ranker.py:44-47)
        if date is None:
            return 1.0
        if date.tzinfo is None:
            date = date.replace(tzinfo=dt.timezone.utc)
        age_days = (self.now - date).days
        return math.exp(-RECENCY_LAMBDA * age_days)

    # -- query (BM25Ranker.query_bm25 :49-61 / DocumentIndex :153-170) -----

    def query_bm25_scores(self, query_tokens: list[str]) -> dict[str, float]:
        scores: dict[str, float] = {}
        for term in query_tokens:  # multiplicity counted
            docs = self.inverted_index.get(term)
            if not docs:
                continue
            w = textlib.ngram_query_weight(term)
            for doc_id in docs:
                pts = self.bm25_doc_term[doc_id].get(term)
                if pts is not None:
                    scores[doc_id] = scores.get(doc_id, 0.0) + pts * w
        return scores

    def query_tfidf_scores(self, query_tokens: list[str]) -> dict[str, float]:
        qtf: dict[str, int] = {}
        for t in query_tokens:
            qtf[t] = qtf.get(t, 0) + 1
        scores: dict[str, float] = {}
        for t, c in qtf.items():
            if t not in self.idf or t not in self.inverted_index:
                continue
            q_score = c * self.idf[t]
            for doc_id in self.inverted_index[t]:
                scores[doc_id] = (scores.get(doc_id, 0.0)
                                  + q_score * self.tfidf[doc_id].get(t, 0.0))
        return scores

    def retrieve(self, query: str, top_k: int = 10,
                 method: str = "bm25") -> list[tuple[str, float]]:
        q = textlib.tokenize_query(query)
        scores = (self.query_bm25_scores(q) if method == "bm25"
                  else self.query_tfidf_scores(q))
        # deterministic canonical order (SURVEY.md §4.4)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:top_k]
