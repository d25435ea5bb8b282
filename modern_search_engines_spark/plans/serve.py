"""Programmatic serving path — the reference's ``/search`` and
``/summarize`` endpoints (SearchEngineServer/api/views.py:33-95)
re-expressed over a built index directory.

The reference unpickles its in-memory index once at server start and
answers each POST with ``retrieve_bm25``/``retrieve_tfidf`` → top-k →
document-display dicts → optional MMR diversification
(DocumentIndex.py:219-230, views.py:51-57). Here the "loaded index" is
the staged table set (``plans.build.load_index``): a search is
tokenize_query → bucket-pruned WAND over the compressed postings (bm25)
or a broadcast-join tf-idf scoring (tfidf) → top-k → a broadcast join
onto the docs display table → result dicts in the reference's JSON
shape (url, url_hash, title, description, icon_url, score [, topics]).

Only the ≤ top_k result rows ever reach the driver. The LDA reranker is
trained lazily on first diversified search (the reference loads its
pre-trained gensim model at server start, ReRanker.py:15-23) and topic
shares are fetched per ranking via ``rerank.topics_for_docs`` — the
full topic table stays distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from ..operators import indexing, mlhooks, query as qmod, rerank, wand
from .build import load_index

DISPLAY_COLS = ("url", "title", "description", "icon_url")


class SearchService:
    """One loaded index directory; ``search()`` per query."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 n_buckets: int = 64):
        self.spark = spark
        self.index_dir = index_dir
        self.n_buckets = n_buckets
        self.idx = load_index(spark, index_dir)
        self.docs = self.idx["docs"].select("doc_id", *DISPLAY_COLS)
        self._tfidf = None
        self._reranker = None
        self._vocab: dict[str, int] | None = None

    # -- spell correction ---------------------------------------------------

    VOCAB_CAP = 50_000  # bounded driver-side dictionary, like a real
    #                     spellchecker's fixed word list

    def _vocabulary(self) -> dict[str, int]:
        """Top-VOCAB_CAP unigram terms by df — the correction dictionary
        (pyspellchecker ships a fixed ~word list; here the index's own
        head vocabulary plays that role, collected once and bounded)."""
        if self._vocab is None:
            rows = (self.idx["term_stats"]
                    .where(~F.col("term").contains(" "))
                    .orderBy(F.desc("df"), F.asc("term"))
                    .limit(self.VOCAB_CAP)
                    .select("term", "df").collect())
            self._vocab = {r["term"]: int(r["df"]) for r in rows}
        return self._vocab

    def correct_query(self, query: str) -> str:
        """Norvig-style per-word correction against the index vocabulary
        (textlib.spell_correct_vocab) — the opt-in stand-in for the
        reference's pyspellchecker pass (Tokenizer.py:36-41)."""
        from .. import textlib
        vocab = self._vocabulary()
        return " ".join(
            textlib.spell_correct_vocab(w, vocab)
            for w in query.lower().split())

    # -- retrieval ----------------------------------------------------------

    def _results(self, ranked) -> list[dict]:
        """ranked(doc_id, score[, rank]) → reference-shaped dicts
        (DocumentIndex.__get_documents minus raw_text, which views.py
        deletes before responding anyway)."""
        rows = (self.docs.join(F.broadcast(ranked), "doc_id")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .collect())
        return [{
            "url": r["url"], "url_hash": r["doc_id"], "title": r["title"],
            "description": r["description"], "icon_url": r["icon_url"],
            "score": float(r["score"]),
        } for r in rows]

    def _search_bm25(self, q: str, top_k: int) -> list[dict]:
        ranked = wand.run_wand(
            self.spark, [("q", q)], self.idx["postings_compressed"],
            self.idx["doc_dim"], k=top_k, n_buckets=self.n_buckets)
        return self._results(ranked.select("doc_id", "score"))

    def _search_tfidf(self, q: str, top_k: int) -> list[dict]:
        if self._tfidf is None:
            self._tfidf = indexing.build_tfidf(
                self.idx["tf"], self.idx["term_stats"])
        terms = qmod.query_terms_df(self.spark, [("q", q)])
        scored = qmod.score_tfidf(self._tfidf, self.idx["term_stats"],
                                  terms)
        top = qmod.topk(scored, top_k)
        return self._results(top.select("doc_id", "score"))

    def _search_bm25f(self, q: str, top_k: int) -> list[dict]:
        """BM25F over the anchor field — an engine EXTENSION (the
        reference scores body text only, BM25Ranker.py:18-61). Requires
        an index built with ``anchor=True``; the anchor scan is
        partition-pruned to the query terms' buckets
        (operators/bm25f.run_bm25f_batch)."""
        if self.idx.get("anchor_field") is None:
            raise ValueError(
                "bm25f needs an index built with anchor=True "
                "(build_persistent_index(..., anchor=True) or "
                "jobs/build_index.py --anchor)")
        from ..operators import bm25f
        ranked = bm25f.run_bm25f_batch(
            self.spark, [("q", q)], self.idx, k=top_k,
            n_buckets=self.n_buckets)
        return self._results(ranked.select("doc_id", "score"))

    def phrase_search(self, phrase: str, top_k: int = 20) -> list[dict]:
        """Exact-phrase retrieval over the positional layer — an engine
        EXTENSION (the reference's position-free index,
        DocumentIndex.py:32,131, cannot answer phrase queries). Requires
        an index built with ``positional=True``; ranks by phrase
        occurrence count, ties by doc_id. The scan is partition-pruned
        to the phrase terms' buckets (operators/phrase.py)."""
        ptok = self.idx.get("positional_postings")
        if ptok is None:
            raise ValueError(
                "phrase search needs an index built with positional=True "
                "(build_persistent_index(..., positional=True) or "
                "jobs/build_index.py --positional)")
        from .. import textlib
        from ..operators import phrase as phrase_ops
        toks = textlib.tokenize(phrase, 1)
        if not toks:
            return []
        ranked = phrase_ops.phrase_topk(ptok, toks, k=top_k,
                                        n_buckets=self.n_buckets)
        return self._results(
            ranked.select("doc_id",
                          F.col("ptf").cast("double").alias("score")))

    def search(self, query: str, top_k: int = 20,
               retrieval_method: str = "bm25",
               diversity: float | None = None,
               spell_correct: bool = True) -> list[dict]:
        """views.py:33-61 semantics. ``diversity`` ∈ [0,1] triggers MMR
        reranking with relevance_importance = 1 − diversity and
        consider=len(results), exactly the endpoint's parameters.
        ``spell_correct`` defaults ON to mirror the reference's
        always-on pyspellchecker pass (Tokenizer.py:36-41) — the vocab
        corrector is identity for in-vocabulary words, so parity-tested
        queries are unaffected; pass False to opt out (e.g. exact-term
        debugging)."""
        if spell_correct:
            query = self.correct_query(query)
        method = retrieval_method.lower()
        if method == "bm25":
            docs = self._search_bm25(query, top_k)
        elif method == "tfidf":
            docs = self._search_tfidf(query, top_k)
        elif method == "bm25f":
            # extension method (not in views.py's bm25|tfidf set):
            # body + in-link anchor-text fields, anchor-built index only
            docs = self._search_bm25f(query, top_k)
        else:
            raise ValueError(
                f"Retrieval method not supported: {retrieval_method}")
        if diversity is not None and docs:
            docs = self._rerank(docs, 1.0 - float(diversity))
        return docs

    # -- rerank -------------------------------------------------------------

    def _rerank(self, docs: list[dict],
                relevance_importance: float) -> list[dict]:
        if self._reranker is None:
            extracted = self.spark.read.parquet(
                os.path.join(self.index_dir, "extracted"))
            doc_topics_df, topics = rerank.train_lda_topics(
                extracted.select("doc_id", "single_tokens"))
            self._doc_topics_df = doc_topics_df.cache()
            self._topics = topics
            self._reranker = True
        ranking = [{"doc_id": d["url_hash"], "score": d["score"], **d}
                   for d in docs]
        shares = rerank.topics_for_docs(
            self._doc_topics_df, [d["doc_id"] for d in ranking])
        rr = rerank.MMRReRanker(shares, self._topics)
        out = rr.rank_documents(
            ranking, relevance_importance=relevance_importance,
            consider=len(ranking))
        for d in out:
            d.pop("doc_id", None)
        return out

    # -- summarize ----------------------------------------------------------

    def summarize_results(self, docs: list[dict]) -> list[dict]:
        """Batch summaries for a result list — ``generate_batch_summary``
        (Summarizer.py:11-15) semantics: a ``summary`` key is added ONLY
        to results whose stripped text exceeds MAX_SUMMARY_LEN (300)
        chars (short docs stay un-summarized — quirk replicated). The
        summarizer hook runs as one distributed Arrow stage over just
        the requested docs."""
        ids = [d["url_hash"] for d in docs]
        if not ids:
            return docs
        ext = (self.spark.read.parquet(
            os.path.join(self.index_dir, "extracted"))
            .where(F.col("doc_id").isin(ids))
            .select("doc_id", F.trim(F.col("text")).alias("text"))
            .where(F.length("text") > 300))
        got = {r["doc_id"]: r["summary"]
               for r in mlhooks.summarize(ext).collect()}
        for d in docs:
            if d["url_hash"] in got:
                d["summary"] = got[d["url_hash"]]
        return docs

    def summarize(self, url_hash: str) -> str | None:
        """views.py:64-95: fetch the document's text by url_hash and run
        the (pluggable) summarizer. Returns None when the doc is absent
        (the endpoint's 404)."""
        row = (self.spark.read.parquet(
            os.path.join(self.index_dir, "extracted"))
            .where(F.col("doc_id") == url_hash)
            .select("text").limit(1).collect())
        if not row:
            return None
        return mlhooks._summarizer(row[0]["text"] or "")
