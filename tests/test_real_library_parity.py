"""Golden parity vs the REAL reference stack — skip-if-absent.

The reference pipeline runs on nltk (word_tokenize, WordNet lemmatizer,
stopword list — Tokenizer.py:1-29), pyspellchecker (Tokenizer.py:13,
36-41), langdetect (Document.py:115-141) and bs4 (Document.py:67-88).
None of those packages ship in this container, so the repo's
``textlib``/``htmlx`` provide documented deterministic stand-ins and
every test below SKIPS cleanly here. On a machine where the libraries
ARE importable the module activates and turns each documented
divergence into a measured number: hard equality where the stand-in
claims exactness (stopword list, bs4 get_text concatenation), an
agreement-rate floor with the measured rate in the failure message
where it claims approximation (lemmatizer, tokenizer, spellchecker,
langdetect). BASELINE.md "Parity scope" points here.

Run with the real stack:
    pip install nltk pyspellchecker langdetect beautifulsoup4
    python -m nltk.downloader stopwords wordnet omw-1.4 punkt punkt_tab
    python -m pytest tests/test_real_library_parity.py -v
"""

from __future__ import annotations

import pytest

from modern_search_engines_spark import textlib

GOLDEN_TEXTS = [
    "The old castle above the river draws visiting students from the "
    "university every summer.",
    "Hotels in Tuebingen were fully booked during the music festival; "
    "restaurants stayed open late.",
    "Libraries, museums and galleries offer free lectures on the "
    "history of the town walls.",
    "A quick brown fox jumps over the lazy dog near the market square.",
    "Die alte Universitätsstadt liegt am Neckar und ist für ihre "
    "Fachwerkhäuser bekannt.",
]


def _nltk_corpora(*names: str):
    """importorskip nltk AND the named corpora (downloads need network;
    absent corpora must skip, not error)."""
    nltk = pytest.importorskip("nltk")
    import nltk.data
    paths = {"stopwords": "corpora/stopwords", "wordnet": "corpora/wordnet",
             "punkt": "tokenizers/punkt", "punkt_tab": "tokenizers/punkt_tab"}
    for n in names:
        try:
            nltk.data.find(paths[n])
        except LookupError:
            try:
                nltk.download(n, quiet=True)
                nltk.data.find(paths[n])
            except Exception:
                pytest.skip(f"nltk corpus {n!r} unavailable offline")
    return nltk


def test_stopword_list_matches_nltk_exactly():
    """The embedded ENGLISH_STOPWORDS constant claims to BE the public
    NLTK english list (textlib.py:42-45) — hard equality, no rate."""
    _nltk_corpora("stopwords")
    from nltk.corpus import stopwords
    assert set(textlib.ENGLISH_STOPWORDS) == set(stopwords.words("english"))


def test_lemmatizer_agreement_rate():
    """Rule lemmatizer vs WordNetLemmatizer on the vocabulary the golden
    corpus actually produces. The stand-in documents itself as morphy-
    in-spirit without dictionary validation — measure how far that is."""
    _nltk_corpora("wordnet")
    from nltk.stem import WordNetLemmatizer
    wn = WordNetLemmatizer()
    words = sorted({w for t in GOLDEN_TEXTS
                    for w in textlib.word_tokenize(t.lower())
                    if w.isalnum()})
    diffs = [(w, textlib.lemmatize(w), wn.lemmatize(w))
             for w in words if textlib.lemmatize(w) != wn.lemmatize(w)]
    rate = 1.0 - len(diffs) / len(words)
    assert rate >= 0.85, (f"lemmatizer agreement {rate:.3f} on "
                          f"{len(words)} words; diffs={diffs}")


def test_document_tokenizer_unigram_f1():
    """textlib.tokenize(n=1) vs the reference tokenize() recomputed with
    real nltk (Tokenizer.py:19-29: lower → tübingen-normalize →
    word_tokenize → isalnum & not-stopword → lemmatize). Token-multiset
    F1 floor, measured value in the message."""
    nltk = _nltk_corpora("stopwords", "wordnet", "punkt", "punkt_tab")
    from collections import Counter

    from nltk.corpus import stopwords
    from nltk.stem import WordNetLemmatizer
    wn, sw = WordNetLemmatizer(), set(stopwords.words("english"))

    def reference_unigrams(text: str) -> list[str]:
        text = textlib.normalize_tuebingen(text.lower())
        toks = nltk.tokenize.word_tokenize(text)
        return [wn.lemmatize(t) for t in toks
                if t.isalnum() and t not in sw]

    scores = []
    for t in GOLDEN_TEXTS:
        ours = Counter(textlib.tokenize(t, ngram_max=1))
        ref = Counter(reference_unigrams(t))
        inter = sum((ours & ref).values())
        denom = sum(ours.values()) + sum(ref.values())
        scores.append(2 * inter / denom if denom else 1.0)
    mean = sum(scores) / len(scores)
    assert mean >= 0.90, f"unigram F1 {mean:.3f} per-text {scores}"


def test_spellchecker_agreement_on_planted_typos():
    """pyspellchecker vs the Norvig-style vocab corrector on canonical
    one-edit typos over a closed vocabulary. The default query path's
    identity stand-in is also measured (its miss count IS the documented
    divergence)."""
    pytest.importorskip("spellchecker")
    from spellchecker import SpellChecker
    spell = SpellChecker()
    typos = {"casle": "castle", "musem": "museum", "restaurnt":
             "restaurant", "univercity": "university", "hotl": "hotel"}
    vocab = {w: 100 for w in typos.values()}
    ours = {t: textlib.spell_correct_vocab(t, vocab) for t in typos}
    ref = {t: spell.correction(t) or t for t in typos}
    agree = sum(ours[t] == ref[t] for t in typos)
    assert agree >= len(typos) - 1, (ours, ref)


def test_langdetect_agreement_on_unambiguous_paragraphs():
    """Stopword-ratio heuristic vs langdetect on clearly-en / clearly-de
    paragraphs — label-level agreement (the heuristic documents its
    scope as exactly these three pipeline languages)."""
    pytest.importorskip("langdetect")
    from langdetect import DetectorFactory, detect
    DetectorFactory.seed = 0
    for text, want in ((GOLDEN_TEXTS[0], "en"), (GOLDEN_TEXTS[4], "de")):
        toks = [t for t in textlib.word_tokenize(text.lower())
                if t.isalnum()]
        assert textlib.detect_document_language(toks, None) == want
        assert detect(text) == want


def test_bs4_get_text_concatenation_parity():
    """htmlx's soup-wide get_text() claims bs4 semantics byte-for-byte
    (htmlx.py:12) — hard equality on golden pages, including the
    whitespace quirks (no separator, no strip)."""
    pytest.importorskip("bs4")
    from bs4 import BeautifulSoup

    from modern_search_engines_spark import corpus, htmlx
    pages = corpus.generate_pages(30, seed=7)
    checked = 0
    for p in pages:
        html = p["html"].decode()
        if html.lstrip()[:4] == "%PDF":
            continue
        ours = htmlx.extracted_text(html)
        soup = BeautifulSoup(html, "html.parser")
        main = soup.find("main")
        ref = main.get_text() if main is not None else soup.get_text()
        assert ours == ref, p["url"]
        checked += 1
    assert checked >= 20
