"""Planted-case tests for the two round-5 web-signal extensions:
anchor-text aggregation (operators/anchortext.py) and bigram-PMI
collocation mining (operators/cooccur.py). The sf0.01 hash-twin check
lives in test_contract_oracle.py (entries anchor_text_terms,
cooccur_pmi); these pin the operator semantics on tiny planted inputs
where the expected answer is computed by hand."""
import math

import pytest

from modern_search_engines_spark.operators import anchortext, cooccur


# ---------------------------------------------------------------- anchor text

def test_anchor_terms_counts_and_topk(spark):
    links = spark.createDataFrame(
        [(1, "best spark guide"),
         (1, "spark guide"),
         (1, "spark"),
         (2, "")],          # empty anchor contributes nothing
        "dst long, anchor_text string")
    full = {(r.doc_id, r.term): r.anchor_tf
            for r in anchortext.anchor_terms(links).collect()}
    assert full == {(1, "spark"): 3, (1, "guide"): 2, (1, "best"): 1}

    top = anchortext.anchor_terms(links, top_k=2).collect()
    got = {(r.doc_id, r.term): (r.anchor_tf, r.rank) for r in top}
    # top-2 by (tf desc, term asc): spark(3) then guide(2); best cut
    assert got == {(1, "spark"): (3, 1), (1, "guide"): (2, 2)}


def test_anchor_terms_tiebreak_is_term_asc(spark):
    links = spark.createDataFrame(
        [(7, "zeta alpha")], "dst long, anchor_text string")
    rows = anchortext.anchor_terms(links, top_k=1).collect()
    assert [(r.term, r.rank) for r in rows] == [("alpha", 1)]


def test_link_anchor_rows_uses_source_prefix(spark):
    docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"),
         (20, "one  two"),     # double space → filtered empty token
         (30, "")],
        "doc_id long, text string")
    edges = spark.createDataFrame(
        [(10, 30), (20, 10), (30, 20)], "src long, dst long")
    rows = {r.dst: r.anchor_text
            for r in anchortext.link_anchor_rows(
                edges, docs, n_tokens=3).collect()}
    assert rows == {30: "alpha beta gamma", 10: "one two", 20: ""}


def test_anchor_in_link_aggregation_end_to_end(spark):
    # two sources pointing at the same target accumulate anchor tf
    docs = spark.createDataFrame(
        [(1, "spark rocks"), (2, "spark sql"), (3, "irrelevant")],
        "doc_id long, text string")
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    links = anchortext.link_anchor_rows(edges, docs, n_tokens=2)
    got = {(r.doc_id, r.term): r.anchor_tf
           for r in anchortext.anchor_terms(links).collect()}
    assert got == {(3, "spark"): 2, (3, "rocks"): 1, (3, "sql"): 1}


# ----------------------------------------------------------------- bigram PMI

def test_bigram_counts_adjacent_within_doc_only(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b"), (3, "")],
        "doc_id long, text string")
    got = {(r.term_a, r.term_b): r.cnt
           for r in cooccur.bigram_counts(docs).collect()}
    # doc 1: (a,b) (b,a) (a,b); docs 2/3: no pairs, no cross-doc pair
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_bigram_pmi_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "x z")], "doc_id long, text string")
    res = {(r.term_a, r.term_b): (r.cnt, r.pmi)
           for r in cooccur.bigram_pmi(docs, min_count=2).collect()}
    # unigrams: x=4 y=3 z=1, tot_uni=8; bigrams: (x,y)=3 (y,x)=2 (x,z)=1,
    # tot_bi = 5+1 = 6; min_count=2 keeps (x,y) and (y,x)
    def pmi(c_ab, c_a, c_b):
        return round(math.log((c_ab / 6) / ((c_a / 8) * (c_b / 8))), 6)
    assert res == {("x", "y"): (3, pmi(3, 4, 3)),
                   ("y", "x"): (2, pmi(2, 3, 4))}


def test_bigram_pmi_total_mass_counts_filtered_pairs(spark):
    # rare pairs are dropped from the OUTPUT but still count in the
    # bigram total (P(a,b) denominators must not drift as min_count
    # changes) — same corpus, two cutoffs, identical surviving pmi
    docs = spark.createDataFrame(
        [(1, "p q p q r s")], "doc_id long, text string")
    loose = {(r.term_a, r.term_b): r.pmi
             for r in cooccur.bigram_pmi(docs, min_count=1).collect()}
    strict = {(r.term_a, r.term_b): r.pmi
              for r in cooccur.bigram_pmi(docs, min_count=2).collect()}
    assert set(strict) == {("p", "q")}
    assert strict[("p", "q")] == pytest.approx(loose[("p", "q")])
