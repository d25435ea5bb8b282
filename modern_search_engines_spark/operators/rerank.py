"""Top-k MMR-style diversification + LDA topics (reference R1/R2).

The greedy diversify loop is inherently sequential over ≤100 rows
(ReRanker.py:41-60) — it runs driver-side on the collected top-k, exactly
like the reference; only topic *training/assignment* is distributed
(pyspark.ml CountVectorizer + LDA replaces gensim, LDAmodel.py:28-39).

Semantics re-expressed with the reference's quirks:
* relevance = Σ scores(reranked) / Σ scores(original top-|reranked|)
  (ReRanker.py:63-70);
* diversity = 1 − clip(Σ |topic_share_avg − 1/K|, ≤1) where shares are
  averaged over the current ranking (ReRanker.py:73-88);
* greedy: seed with rank-1, then repeatedly append the candidate among
  the next ``consider`` maximizing λ·rel + (1−λ)·div, ties → last
  maximizer wins (the reference's ``>=``, ReRanker.py:54-56);
* topic labels by keyword membership over the topic's top words
  (LDAmodel.py:41-56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOPIC_LABEL_RULES = (
    (("research", "scholar", "university", "model"), "University & Research"),
    (("city", "town", "castle"), "City & Sights"),
    (("travel", "hotel"), "Travel"),
    (("food",), "Food & Drinks"),
    (("review",), "Reviews"),
)


def label_topic(top_words: list[str]) -> str | None:
    for keywords, label in TOPIC_LABEL_RULES:
        if any(w in top_words for w in keywords):
            return label
    return None


def train_lda_topics(docs: DataFrame, num_topics: int = 20,
                     vocab_size: int = 2000, max_iter: int = 20,
                     seed: int = 123) -> tuple[DataFrame, dict]:
    """Distributed topic assignment + topic labels via pyspark.ml LDA
    over ``single_tokens`` (tübingen variants excluded, LDAmodel.py:17-18).

    Returns ``(doc_topics, topics)`` where ``doc_topics`` is a DATAFRAME
    (doc_id, topic, share) — never collected to the driver: at corpus
    scale the per-doc distribution table is as large as the corpus.
    Only the ≤k docs of a ranking being diversified are ever collected
    (``topics_for_docs``); ``topics`` (num_topics label entries) is the
    only driver-side object.
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    filtered = docs.select(
        "doc_id",
        F.array_remove(F.array_remove("single_tokens", "tübingen"),
                       "tuebingen").alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="features",
                         vocabSize=vocab_size, minDF=1.0)
    cv_model = cv.fit(filtered)
    vecs = cv_model.transform(filtered)
    lda = LDA(k=num_topics, maxIter=max_iter, seed=seed,
              featuresCol="features")
    model = lda.fit(vecs)

    vocab = cv_model.vocabulary
    topics = {}
    for row in model.describeTopics(10).collect():
        words = [vocab[i] for i in row["termIndices"]]
        topics[row["topic"]] = label_topic(words)

    doc_topics = (
        model.transform(vecs)
        .select("doc_id",
                F.posexplode(vector_to_array("topicDistribution"))
                .alias("topic", "share"))
        .where(F.col("share") > 1e-8))
    return doc_topics, topics


def topics_for_docs(doc_topics: DataFrame, doc_ids) -> dict:
    """Collect topic shares for a SPECIFIC doc set (a top-k ranking) —
    the only place the topic table reaches the driver, bounded by k·K
    rows. At scale the isin filter prunes via the doc_id sort/partition
    order of the persisted table."""
    ids = list(doc_ids)
    rows = doc_topics.where(F.col("doc_id").isin(ids)).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (int(r["topic"]), float(r["share"])))
    for shares in out.values():
        shares.sort()
    return out


def diversify_runs(results: DataFrame, doc_topics: DataFrame,
                   topics: dict, relevance_importance: float = 0.9
                   ) -> DataFrame:
    """Distributed per-query MMR diversification of a batch run:
    results(qid, rank, doc_id, score) → same schema, reranked.

    The greedy MMR loop is inherently sequential WITHIN a query
    (ReRanker.py:41-60) but embarrassingly parallel ACROSS queries —
    exactly the ``applyInPandas``-per-qid shape: topic shares join onto
    the results distributedly, each group call reranks one query's ≤ k
    rows with the same ``MMRReRanker`` engine, and nothing reaches the
    driver (a driver-side loop over collected results would bottleneck
    at millions of queries). ``topics`` (numtopics label entries) rides
    into the workers via closure capture — scalars, not data.
    """
    import pandas as pd

    joined = results.join(doc_topics, "doc_id", "left")

    def _one_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        per_doc = (pdf.drop_duplicates("rank")
                   .sort_values("rank"))
        ranking = [{"doc_id": d, "score": float(s)}
                   for d, s in zip(per_doc["doc_id"], per_doc["score"])]
        shares: dict = {}
        for d, t, p in zip(pdf["doc_id"], pdf["topic"], pdf["share"]):
            if pd.notna(t):
                shares.setdefault(d, []).append((int(t), float(p)))
        for v in shares.values():
            v.sort()
        rr = MMRReRanker(shares, topics)
        out = rr.rank_documents(
            ranking, relevance_importance=relevance_importance,
            consider=len(ranking))
        return pd.DataFrame({
            "qid": [qid] * len(out),
            "rank": range(1, len(out) + 1),
            "doc_id": [d["doc_id"] for d in out],
            "score": [d["score"] for d in out],
        })

    return (joined.groupBy("qid").applyInPandas(
        _one_query,
        schema="qid string, rank int, doc_id string, score double"))


class MMRReRanker:
    """Driver-side greedy diversification over a collected top-k
    (ReRanker.py:25-100 semantics)."""

    def __init__(self, doc_topics: dict, topics: dict):
        self.doc_topics = doc_topics
        self.topics = topics
        self.original: list[dict] = []

    def _relevance(self, ranking: list[dict]) -> float:
        max_rel = sum(d["score"] for d in self.original[: len(ranking)])
        rel = sum(d["score"] for d in ranking)
        return rel / max_rel if max_rel else 0.0

    def _diversity(self, ranking: list[dict]) -> float:
        shares: dict[int, float] = {}
        for d in ranking:
            for topic, p in self.doc_topics.get(d["doc_id"], []):
                shares[topic] = shares.get(topic, 0.0) + p / len(ranking)
        perfect = 1.0 / len(self.topics) if self.topics else 0.0
        deviation = sum(abs(v - perfect) for v in shares.values())
        return 1.0 - min(deviation, 1.0)

    def diversify(self, ranking: list[dict], relevance_importance: float,
                  consider: int) -> list[dict]:
        if not ranking:
            return []
        docs = list(ranking)
        reranked = [docs.pop(0)]
        while docs:
            v_max, max_doc = 0.0, None
            for doc in docs[:consider]:
                reranked.append(doc)
                v = (relevance_importance * self._relevance(reranked)
                     + (1 - relevance_importance)
                     * self._diversity(reranked))
                if v >= v_max:           # >= : last maximizer wins (quirk)
                    v_max, max_doc = v, doc
                reranked.pop()
            reranked.append(max_doc)
            docs.remove(max_doc)
        return reranked

    def rank_documents(self, original: list[dict],
                       topic_threshold: float = 0.2,
                       relevance_importance: float = 0.7,
                       consider: int = 5) -> list[dict]:
        self.original = original
        if not original:
            return []
        ranking = self.diversify(original, relevance_importance, consider)
        for doc in ranking:
            labels = {
                self.topics[t]
                for t, p in self.doc_topics.get(doc["doc_id"], [])
                if p >= topic_threshold and self.topics.get(t) is not None
            }
            doc["topics"] = sorted(labels)
        return ranking
