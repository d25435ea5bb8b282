"""Serving path (plans/serve.py — the /search + /summarize analog):
result shape and ranks match the single-node oracle's retrieve()."""

import pytest

from modern_search_engines_spark import corpus
from modern_search_engines_spark.oracle import OracleEngine
from modern_search_engines_spark.oracle.engine import doc_from_page
from modern_search_engines_spark.plans.build import build_persistent_index
from modern_search_engines_spark.plans.serve import SearchService

N, SEED = 50, 13


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("serve") / "idx")
    pages = corpus.pages_df(spark, N, seed=SEED,
                            num_partitions=2).drop("text", "lang")
    build_persistent_index(spark, pages, out, verbose=False)
    return SearchService(spark, out)


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine()
    eng.build([doc_from_page(p["url"], p["html"].decode())
               for p in corpus.generate_pages(N, seed=SEED)])
    return eng


def test_search_bm25_matches_oracle(service, oracle):
    docs = service.search("castle museum", top_k=10)
    expected = oracle.retrieve("castle museum", 10)
    assert [d["url_hash"] for d in docs] == [d for d, _ in expected]
    for d, (_, score) in zip(docs, expected):
        assert d["score"] == pytest.approx(score, rel=1e-9)
    assert set(docs[0]) == {"url", "url_hash", "title", "description",
                            "icon_url", "score"}


def test_search_tfidf_runs(service):
    docs = service.search("castle museum", top_k=5,
                          retrieval_method="tfidf")
    assert 0 < len(docs) <= 5
    assert all(docs[i]["score"] >= docs[i + 1]["score"]
               for i in range(len(docs) - 1))


def test_search_unknown_method(service):
    with pytest.raises(ValueError):
        service.search("castle", retrieval_method="bleu")


def test_search_bm25f_requires_anchor_index(service):
    # the fixture index is built WITHOUT anchor=True: the bm25f
    # extension method must refuse loudly, not silently score body-only
    with pytest.raises(ValueError, match="anchor=True"):
        service.search("castle museum", retrieval_method="bm25f")


def test_search_with_diversity_reranks(service):
    plain = service.search("castle museum university", top_k=8)
    diverse = service.search("castle museum university", top_k=8,
                             diversity=0.9)
    assert len(diverse) == len(plain)
    assert {d["url_hash"] for d in diverse} == \
        {d["url_hash"] for d in plain}
    assert all("topics" in d for d in diverse)  # labels attached
    assert diverse[0]["url_hash"] == plain[0]["url_hash"]  # rank-1 seeds


def test_batch_summaries_length_gate(service):
    docs = service.search("castle museum", top_k=8)
    out = service.summarize_results(docs)
    assert out is docs  # mutates in place, like the reference
    # 49/50 corpus texts exceed the 300-char gate, so summaries must
    # actually appear on this result set
    assert any("summary" in d for d in out)
    for d in out:
        if "summary" in d:
            assert isinstance(d["summary"], str) and d["summary"]


def test_spell_corrected_search_recovers_typo_by_default(service):
    good = service.search("castle", top_k=5)
    typo_default = service.search("casle", top_k=5)  # correction is ON
    typo_off = service.search("casle", top_k=5, spell_correct=False)
    # opt-out: the raw typo matches no posting list at all
    assert good and typo_off == []
    # default: the misspelled query reproduces the clean query exactly
    # (ids + scores) — the reference's always-on corrector, mirrored
    assert [(d["url_hash"], d["score"]) for d in typo_default] == \
        [(d["url_hash"], d["score"]) for d in good]
    assert service.correct_query("casle") == "castle"


def test_summarize_known_and_unknown(service, oracle):
    some_id = next(iter(oracle.tf))
    s = service.summarize(some_id)
    assert isinstance(s, str) and s
    assert service.summarize("0" * 32) is None
