"""Dedup / similarity / multimodal / streaming / rerank / eval operator
tests (SURVEY.md §2.10 + training-data-pipeline families)."""

import math

import pytest
from pyspark.sql import functions as F

from modern_search_engines_spark import corpus, textlib
from modern_search_engines_spark.operators import (
    dedup, evaluate, indexing, multimodal, rerank, similarity,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_dups(spark):
    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other")],
        "doc_id string, text string")
    rows = dedup.exact_dups(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2
    assert rows[0]["doc_ids"] == ["a", "b"]


def test_simhash_near_dups_finds_identical_docs(spark):
    # two identical token sets → identical simhash → distance 0
    h = textlib.simhash128(["castle", "museum", "river"])
    hi, lo = textlib.simhash_to_longs(h)
    h2 = textlib.simhash128(["completely", "different", "words", "here"])
    hi2, lo2 = textlib.simhash_to_longs(h2)
    df = spark.createDataFrame(
        [("a", hi, lo), ("b", hi, lo), ("c", hi2, lo2)],
        "doc_id string, sim_hi long, sim_lo long")
    rows = dedup.simhash_near_dups(df, max_distance=5).collect()
    assert [(r["doc_a"], r["doc_b"], r["distance"])
            for r in rows] == [("a", "b", 0)]


def test_simhash_near_dups_on_corpus(spark):
    pages = corpus.pages_df(spark, 30, seed=2,
                            num_partitions=2).drop("text", "lang")
    ext = indexing.extract_pages(pages, ngram_max=1)
    pairs = dedup.simhash_near_dups(ext, max_distance=5)
    # no identical pages in the synthetic corpus → likely empty, but the
    # plan must execute and never crossJoin
    assert "CartesianProduct" not in pairs._jdf.queryExecution().toString()
    pairs.collect()


def test_embedding_near_dups(spark, sf_dirs):
    emb = spark.read.parquet(f"{sf_dirs['t1']}/embeddings.parquet")
    # self-similarity guard: add a duplicated vector (routed to the
    # one canonical implementation, similarity.embedding_near_dups)
    one = emb.limit(1).withColumn("vec_id", F.lit(999_999))
    rows = similarity.embedding_near_dups(
        emb.unionByName(one), threshold=0.999).collect()
    assert any({r["vec_a"], r["vec_b"]} == {0, 999_999} or
               r["cos"] >= 0.999 for r in rows)


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark, sf_dirs):
    return spark.read.parquet(f"{sf_dirs['t1']}/embeddings.parquet").cache()


def test_brute_force_topk_self_first(spark, emb):
    q = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    top = similarity.brute_force_topk(emb, list(q), k=5).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cos"] == pytest.approx(1.0, abs=1e-9)
    scores = [r["cos"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_contains_self_and_subset_of_bruteforce(spark, emb):
    q = list(emb.where(F.col("vec_id") == 7).collect()[0]["embedding"])
    exact = {r["vec_id"]: r["cos"]
             for r in similarity.brute_force_topk(emb, q, k=500).collect()}
    approx = similarity.lsh_topk(emb, q, k=10, n_bits=8).collect()
    assert approx[0]["vec_id"] == 7
    for r in approx:
        assert r["cos"] == pytest.approx(exact[r["vec_id"]], rel=1e-9)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNGfakebytes")),
         (2, "audio", bytearray(b"RIFFfake")),
         (3, "image", None)],
        "id long, kind string, payload binary")
    rows = {r["id"]: r for r in
            multimodal.extract_features(df).collect()}
    assert rows[1]["n_bytes"] == 13 and rows[1]["width"] > 0
    assert rows[2]["width"] == 0  # audio has no dims
    assert rows[3]["n_bytes"] == 0  # null payload handled
    assert len(rows[1]["feature"]) == 8
    again = {r["id"]: r for r in
             multimodal.extract_features(df).collect()}
    assert rows[1]["feature"] == again[1]["feature"]  # deterministic


def test_multimodal_real_decoder_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder(b"x", "image")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, "video", bytearray(b"x" * 95))],
        "id long, kind string, payload binary")
    rows = multimodal.frame_sample_plan(df, every_n=30).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# evaluation metrics (reference quirks R3-R5)
# ---------------------------------------------------------------------------

def test_metric_quirks():
    model = ["a", "b", "c", "d"]
    gt = ["b", "d", "x", "y", "z"]
    assert evaluate.mrr(model, gt) == 0.5
    # IDCG over ALL 5 gt results (quirk)
    idcg = sum(1 / math.log2(j + 1) for j in range(1, 6))
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    assert evaluate.ndcg(model, gt) == pytest.approx(dcg / idcg)
    # MAP divided by len(gt)=5 (quirk)
    ap = (1 / 2 + 2 / 4) / 5
    assert evaluate.average_precision(model, gt) == pytest.approx(ap)


def test_evaluate_runs_distributed_matches_driver(spark):
    runs = spark.createDataFrame(
        [("q1", 1, "a"), ("q1", 2, "b"), ("q1", 3, "c"), ("q1", 4, "d"),
         ("q2", 1, "x")],
        "qid string, rank int, url string")
    qrels = spark.createDataFrame(
        [("q1", "b", 1), ("q1", "d", 1), ("q1", "x", 1), ("q1", "y", 1),
         ("q1", "z", 1), ("q2", "nope", 1)],
        "qid string, url string, relevant int")
    rows = {r["qid"]: r for r in
            evaluate.evaluate_runs(runs, qrels).collect()}
    model, gt = ["a", "b", "c", "d"], ["b", "d", "x", "y", "z"]
    assert rows["q1"]["mrr"] == pytest.approx(evaluate.mrr(model, gt))
    assert rows["q1"]["ndcg"] == pytest.approx(evaluate.ndcg(model, gt))
    assert rows["q1"]["map"] == pytest.approx(
        evaluate.average_precision(model, gt))
    assert rows["q2"]["mrr"] == 0.0


def test_summarize_by_model(spark):
    metrics = spark.createDataFrame(
        [("bm25", 1.0, 0.5, 0.2), ("bm25", 0.5, 0.7, 0.4),
         ("tfidf", 0.25, 0.1, 0.1)],
        "model string, mrr double, ndcg double, map double")
    rows = {r["model"]: r for r in
            evaluate.summarize_by_model(metrics).collect()}
    assert rows["bm25"]["mrr_mean"] == pytest.approx(0.75)
    assert rows["bm25"]["mrr_var"] == pytest.approx(0.125)  # sample var
    assert rows["tfidf"]["ndcg_mean"] == pytest.approx(0.1)
    assert rows["tfidf"]["ndcg_var"] is None  # var_samp of 1 row


# ---------------------------------------------------------------------------
# rerank (MMR, reference quirks)
# ---------------------------------------------------------------------------

def _ranking():
    return [{"doc_id": f"d{i}", "score": 1.0 - 0.1 * i} for i in range(5)]


def test_mmr_pure_relevance_keeps_order():
    rr = rerank.MMRReRanker(doc_topics={}, topics={0: None})
    out = rr.rank_documents(_ranking(), relevance_importance=1.0,
                            consider=5)
    assert [d["doc_id"] for d in out] == ["d0", "d1", "d2", "d3", "d4"]


def test_mmr_diversity_prefers_spread_topics():
    # d1 shares d0's topic; d2 covers the other topic → with diversity
    # weight, d2 should jump ahead of d1
    doc_topics = {"d0": [(0, 1.0)], "d1": [(0, 1.0)], "d2": [(1, 1.0)],
                  "d3": [(0, 1.0)], "d4": [(1, 1.0)]}
    topics = {0: "A", 1: "B"}
    rr = rerank.MMRReRanker(doc_topics, topics)
    out = rr.rank_documents(_ranking(), relevance_importance=0.1,
                            consider=4)
    assert out[0]["doc_id"] == "d0"          # rank-1 always seeds
    assert out[1]["doc_id"] in ("d2", "d4")  # other-topic doc promoted
    assert out[1]["topics"] == ["B"]


def test_mmr_empty():
    rr = rerank.MMRReRanker({}, {})
    assert rr.rank_documents([]) == []


def test_lda_topics_trains(spark):
    pages = corpus.pages_df(spark, 25, seed=4,
                            num_partitions=2).drop("text", "lang")
    docs = indexing.extract_pages(pages, ngram_max=1).select(
        "doc_id", "single_tokens")
    doc_topics_df, topics = rerank.train_lda_topics(
        docs, num_topics=5, max_iter=5)
    assert set(topics) == {0, 1, 2, 3, 4}
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert doc_topics_df.select("doc_id").distinct().count() == 25
    # only the requested (top-k) docs are collected driver-side
    subset = rerank.topics_for_docs(doc_topics_df, all_ids[:7])
    assert set(subset) == set(all_ids[:7])
    for shares in subset.values():
        assert abs(sum(p for _, p in shares) - 1.0) < 1e-6
    # the collected dict plugs straight into the driver-side MMR loop
    ranking = [{"doc_id": d, "score": 1.0 - 0.01 * i}
               for i, d in enumerate(all_ids[:7])]
    out = rerank.MMRReRanker(subset, topics).rank_documents(ranking)
    assert len(out) == 7


def test_diversify_runs_matches_driver_mmr(spark):
    """Distributed per-query MMR (applyInPandas) must equal the
    driver-side MMRReRanker on identical inputs, query by query."""
    doc_topics_rows = [("d0", 0, 1.0), ("d1", 0, 1.0), ("d2", 1, 1.0),
                       ("d3", 0, 1.0), ("d4", 1, 1.0)]
    topics = {0: "A", 1: "B"}
    results_rows = []
    for qid in ("q1", "q2"):
        for i in range(5):
            results_rows.append((qid, i + 1, f"d{i}", 1.0 - 0.1 * i))
    results = spark.createDataFrame(
        results_rows, "qid string, rank int, doc_id string, score double")
    doc_topics = spark.createDataFrame(
        doc_topics_rows, "doc_id string, topic int, share double")

    out = rerank.diversify_runs(results, doc_topics, topics,
                                relevance_importance=0.1)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    for qid in got:
        got[qid].sort()

    shares = {d: [(t, p)] for d, t, p in doc_topics_rows}
    rr = rerank.MMRReRanker(shares, topics)
    expected = rr.rank_documents(
        [{"doc_id": f"d{i}", "score": 1.0 - 0.1 * i} for i in range(5)],
        relevance_importance=0.1, consider=5)
    exp = [(i + 1, d["doc_id"]) for i, d in enumerate(expected)]
    assert got == {"q1": exp, "q2": exp}
