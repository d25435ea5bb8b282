"""Oracle engine semantics tests — the quirks that must survive
(SURVEY.md §2.5 A5/A7, §2.8 F7-F9)."""

import datetime as dt
import math

import pytest

from modern_search_engines_spark import corpus, textlib
from modern_search_engines_spark.oracle import OracleDoc, OracleEngine
from modern_search_engines_spark.oracle.engine import (
    B, K1, PINNED_NOW, RECENCY_LAMBDA, doc_from_page,
)


def _doc(doc_id, tokens, title="", headings=None, emphasis=None, date=None):
    return OracleDoc(
        url=f"https://x.example/{doc_id}-tuebingen", doc_id=doc_id,
        title=title, single_tokens=tokens + ["tübingen"],
        headings=headings or {}, text_emphasis=emphasis or {},
        last_modified=date, language="en",
    )


def test_tf_df_idf_counts():
    eng = OracleEngine(ngram_max=1)
    eng.build([
        _doc("d1", ["castle", "castle", "river"]),
        _doc("d2", ["castle", "museum"]),
    ])
    assert eng.total_documents == 2
    assert eng.tf["d1"]["castle"] == 2
    assert eng.tf["d2"]["castle"] == 1
    assert eng.df["castle"] == 2
    assert eng.df["river"] == 1
    assert eng.idf["castle"] == pytest.approx(math.log(2 / 2))
    assert eng.idf["river"] == pytest.approx(math.log(2 / 1))


def test_avgdl_is_unigram_but_doclen_is_multiset():
    # A5 vs A7 quirk: avgdl from single_tokens, BM25 dl from the full
    # 1..3-gram + title multiset.
    eng = OracleEngine(ngram_max=3)
    d = _doc("d1", ["castle", "river", "museum"], title="Nice Castle")
    eng.build([d])
    assert eng.avg_doc_length == 4.0  # 3 + tübingen unigrams
    dl = sum(eng.tf["d1"].values())
    assert dl > eng.avg_doc_length  # ngrams + title inflate it


def test_title_tokens_appended_to_tf():
    eng = OracleEngine(ngram_max=1)
    eng.build([_doc("d1", ["castle"], title="castle")])
    # castle appears in body AND title → tf 2
    assert eng.tf["d1"]["castle"] == 2


def test_field_weight_compounding():
    eng = OracleEngine(ngram_max=1)
    meta = {
        "title": ["castle"],
        "headings": {"h1": {"castle"}, "h2": {"castle"}, "h3": set()},
        "text_emphasis": {"bold": {"castle"}, "italic": set()},
    }
    w = eng._field_weight("castle", meta)
    assert w == pytest.approx(2 * 1.6 * 1.6 * 1.2)


def test_recency_integer_floor_days():
    eng = OracleEngine(ngram_max=1)
    d = PINNED_NOW - dt.timedelta(days=10, hours=23)
    # timedelta.days floors → 10
    assert eng._recency(d) == pytest.approx(math.exp(-RECENCY_LAMBDA * 10))


def test_missing_date_imputed_with_avg():
    eng = OracleEngine(ngram_max=1)
    dated = _doc("d1", ["castle"], date=PINNED_NOW - dt.timedelta(days=100))
    undated = _doc("d2", ["castle"])
    eng.build([dated, undated])
    assert eng.doc_meta["d2"]["date"] is not None
    assert (eng.doc_meta["d2"]["date"] - eng.doc_meta["d1"]["date"]
            ).total_seconds() == pytest.approx(0)


def test_bm25_formula_exact():
    eng = OracleEngine(ngram_max=1)
    date = PINNED_NOW - dt.timedelta(days=50)
    eng.build([
        _doc("d1", ["castle", "castle", "river"], date=date),
        _doc("d2", ["museum"], date=date),
    ])
    tf = eng.tf["d1"]["castle"]
    dl = sum(eng.tf["d1"].values())
    idf = eng.idf["castle"]
    frac = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / eng.avg_doc_length))
    expected = math.exp(-RECENCY_LAMBDA * 50) * idf * frac
    assert eng.bm25_doc_term["d1"]["castle"] == pytest.approx(expected)


def test_query_or_semantics_and_multiplicity():
    eng = OracleEngine(ngram_max=1)
    date = PINNED_NOW - dt.timedelta(days=1)
    eng.build([
        _doc("d1", ["castle"], date=date),
        _doc("d2", ["river"], date=date),
    ])
    s = eng.query_bm25_scores(["castle", "river"])
    assert set(s) == {"d1", "d2"}  # union, not intersection
    s2 = eng.query_bm25_scores(["castle", "castle"])
    assert s2["d1"] == pytest.approx(2 * eng.query_bm25_scores(["castle"])["d1"])


def test_gate_filters_non_english_and_irrelevant():
    eng = OracleEngine(ngram_max=1)
    german = OracleDoc(url="https://x.example/de", doc_id="g1", title="",
                       single_tokens=["tübingen"], headings={},
                       text_emphasis={}, last_modified=None, language="de")
    no_tueb = _doc("d2", ["castle"])
    no_tueb.single_tokens = ["castle"]
    good = _doc("d3", ["castle"])
    eng.build([german, no_tueb, good])
    assert eng.total_documents == 1


def test_retrieve_deterministic_tiebreak():
    eng = OracleEngine(ngram_max=1)
    date = PINNED_NOW - dt.timedelta(days=1)
    eng.build([_doc("db", ["castle"], date=date),
               _doc("da", ["castle"], date=date)])
    top = eng.retrieve("castle", 2)
    assert [d for d, _ in top] == ["da", "db"]  # score tie → doc_id asc


def test_end_to_end_from_corpus():
    pages = corpus.generate_pages(40, seed=7)
    docs = [doc_from_page(p["url"], p["html"].decode("utf-8"))
            for p in pages]
    eng = OracleEngine()
    eng.build(docs)
    assert eng.total_documents > 0
    res = eng.retrieve("castle museum", 10)
    assert len(res) > 0
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
