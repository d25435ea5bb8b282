"""Shared pure-Python text semantics (tokenizer, lemmatizer, n-grams,
simhash, language heuristic).

This module is the *spec-as-code* for every text transform in the engine.
It is imported both by the single-node oracle (``oracle/engine.py``) and by
the Spark pandas UDFs (``functions/udfs.py``) so that distributed output is
byte-identical to the oracle by construction — the parity tests then verify
the *distributed plumbing* (partitioning, Arrow round-trips, null handling,
ordering) rather than two divergent implementations.

Reference semantics re-expressed (NOT copied) from
``/root/reference/backend/core/Tokenizer.py:19-78`` and
``/root/reference/backend/core/Document.py:115-180``. The reference uses
nltk (word_tokenize, WordNet lemmatizer, stopwords), pyspellchecker and
langdetect; none of those are available here, so this module defines
deterministic stdlib equivalents:

* word tokenization  — regex split into word / punctuation tokens
  (approximates Penn-Treebank behaviour for the pipeline's purposes: only
  ``str.isalnum()`` tokens survive the filter anyway, Tokenizer.py:22).
* stopwords          — the standard public NLTK English stopword list,
  embedded as a frozen constant.
* lemmatizer         — deterministic noun-suffix rules in the spirit of
  WordNet morphy (no dictionary validation — divergence documented).
* spell-correction   — identity (pyspellchecker unavailable); the fallback
  structure of ``tokenize_query`` (Tokenizer.py:36-57) is preserved.
* synonym expansion  — small embedded deterministic synonym table standing
  in for WordNet synsets (Tokenizer.py:58-72); cap-at-40 logic preserved.
* language detection — deterministic stopword-hit ratio heuristic over
  en/de/fr, with the reference's +0.33 html-lang boost and
  ``round(p_en) > 0.4`` gate (Document.py:115-141) preserved verbatim.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Iterable

# ---------------------------------------------------------------------------
# Stopwords — the public NLTK English list (public knowledge, reproduced as
# data, not code). Reference loads it via nltk.corpus.stopwords
# (Tokenizer.py:16).
# ---------------------------------------------------------------------------

ENGLISH_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())

GERMAN_STOPWORDS = frozenset("""
der die das und oder aber ein eine einer eines einem einen ich du er sie
es wir ihr nicht mit von zu im in am auf für ist sind war waren wird
werden wurde bei nach aus dem den des als auch an um noch nur so wie man
hat haben kann wenn dann doch schon sehr mehr durch über unter vor bis
ohne gegen diese dieser dieses alle allen etwas nichts mich dich sich uns
euch ihm ihn ihnen wo was wer dass weil denn ja nein kein keine
""".split())

FRENCH_STOPWORDS = frozenset("""
le la les un une des du de et ou mais je tu il elle nous vous ils elles
ne pas avec pour dans sur par est sont était à au aux ce cette ces son sa
ses mon ma mes ton ta tes qui que quoi dont où plus moins très bien comme
tout tous toute toutes rien quelque être avoir fait faire si alors donc
""".split())

# ---------------------------------------------------------------------------
# Tokenization (Tokenizer.py:19-29 semantics)
# ---------------------------------------------------------------------------

# Word-or-punctuation split. Underscore-bearing (\w includes _) and
# punctuation tokens fail .isalnum() downstream just as nltk's punctuation
# tokens do.
_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

# Tübingen variant normalization (Tokenizer.py:20).
_TUEBINGEN_VARIANTS = ("tuebingen", "tubingen", "tübinger")


def normalize_tuebingen(text: str) -> str:
    for v in _TUEBINGEN_VARIANTS:
        text = text.replace(v, "tübingen")
    return text


def word_tokenize(text: str) -> list[str]:
    """Deterministic word/punct tokenizer (stands in for nltk.word_tokenize)."""
    return _WORD_RE.findall(text)


# Deterministic noun-suffix lemmatizer in the spirit of WordNet morphy
# (Tokenizer.py:15,22). Rules applied in order; first match wins. No
# dictionary validation (WordNet unavailable) — documented divergence.
_LEMMA_EXCEPTIONS = {
    # Germanic irregulars
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "lice": "louse",
    "people": "person", "oxen": "ox", "dice": "die",
    # -f/-fe → -ves (the suffix rules cannot recover the f)
    "leaves": "leaf", "lives": "life", "wives": "wife", "knives": "knife",
    "halves": "half", "selves": "self", "shelves": "shelf",
    "calves": "calf", "loaves": "loaf", "scarves": "scarf",
    "thieves": "thief", "wolves": "wolf", "elves": "elf",
    "hooves": "hoof",
    # -o → -oes (plain s-strip would leave a trailing e)
    "potatoes": "potato", "tomatoes": "tomato", "heroes": "hero",
    "echoes": "echo", "torpedoes": "torpedo", "vetoes": "veto",
    "mosquitoes": "mosquito", "volcanoes": "volcano",
    "tornadoes": "tornado", "buffaloes": "buffalo", "mangoes": "mango",
    "cargoes": "cargo",
    # Latin/Greek plurals
    "data": "datum", "criteria": "criterion", "phenomena": "phenomenon",
    "bacteria": "bacterium", "curricula": "curriculum",
    "memoranda": "memorandum", "strata": "stratum", "media": "medium",
    "millennia": "millennium", "corpora": "corpus", "genera": "genus",
    "quanta": "quantum", "spectra": "spectrum", "automata": "automaton",
    "schemata": "schema",
    "fungi": "fungus", "alumni": "alumnus", "cacti": "cactus",
    "nuclei": "nucleus", "radii": "radius", "stimuli": "stimulus",
    "syllabi": "syllabus", "foci": "focus",
    "larvae": "larva", "algae": "alga", "antennae": "antenna",
    "formulae": "formula", "nebulae": "nebula", "vertebrae": "vertebra",
    "indices": "index", "matrices": "matrix", "appendices": "appendix",
    "vertices": "vertex", "vortices": "vortex",
    "analyses": "analysis", "theses": "thesis", "crises": "crisis",
    "oases": "oasis", "diagnoses": "diagnosis",
    "hypotheses": "hypothesis", "parentheses": "parenthesis",
    "synopses": "synopsis",
    # high-frequency -ies words kept from the original table ("ies"→"y"
    # handles them too; pinned so a rule reshuffle can't change them)
    "cities": "city", "queries": "query", "entries": "entry",
    # -ie stems: the "ies"→"y" rule would mangle these ("movies"→"movy");
    # WordNet's s-strip candidate is the valid noun
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
    "calories": "calorie", "ties": "tie", "lies": "lie", "pies": "pie",
    "dies": "die", "goalies": "goalie", "rookies": "rookie",
    "newbies": "newbie", "hoodies": "hoodie", "selfies": "selfie",
    "smoothies": "smoothie", "prairies": "prairie", "sorties": "sortie",
    "genies": "genie", "collies": "collie", "pixies": "pixie",
    # nltk's shortest-valid-form quirk: lemmatize("species") → "specie"
    # (both are WordNet nouns; min-by-length wins) — mirrored, not fixed
    "species": "specie",
    # more -f/-fe → -ves
    "dwarves": "dwarf", "sheaves": "sheaf", "wharves": "wharf",
    "werewolves": "werewolf",
    # more Latin/Greek plurals (all in WordNet's noun exception list)
    "addenda": "addendum", "errata": "erratum", "ova": "ovum",
    "referenda": "referendum", "symposia": "symposium",
    "aquaria": "aquarium", "stigmata": "stigma",
    "emphases": "emphasis", "neuroses": "neurosis",
    "psychoses": "psychosis", "prognoses": "prognosis",
    "metamorphoses": "metamorphosis",
    "termini": "terminus", "emeriti": "emeritus", "octopi": "octopus",
    "hippopotami": "hippopotamus",
    "apices": "apex", "codices": "codex", "helices": "helix",
    "cortices": "cortex",
    # Italian loans
    "paparazzi": "paparazzo", "graffiti": "graffito",
    "virtuosi": "virtuoso", "libretti": "libretto",
    "concerti": "concerto", "tempi": "tempo",
    # French -eaux
    "bureaux": "bureau", "tableaux": "tableau", "plateaux": "plateau",
    "chateaux": "chateau", "gateaux": "gateau",
    # more -o → -oes
    "dominoes": "domino", "embargoes": "embargo", "haloes": "halo",
    # Germanic irregular
    "brethren": "brother",
}

# Words the WordNet-backed lemmatizer would return UNCHANGED because
# the s-stripped candidate is NOT a noun in its lexicon (nltk's
# lemmatize picks the SHORTEST valid noun form, so only words whose
# stripped form is a non-word or a non-noun are safe to pin here —
# "lens"→"len"✗, "news"→"new"✗, "upstairs"→"upstair"✗; NOT e.g.
# "statistics", whose stripped "statistic" IS a noun and is what nltk
# returns). Checked before the suffix rules; narrows the no-dictionary
# divergence documented in the module header.
_LEMMA_KEEP = frozenset("""
news series lens atlas bias canvas chaos gas alias christmas
mathematics economics politics athletics gymnastics
electronics genetics linguistics logistics phonetics robotics
thermodynamics aerobics forensics calisthenics
measles diabetes rabies herpes mumps
scissors headquarters whereabouts tweezers
clothes molasses shambles billiards summons
kudos pathos ethos cosmos corps rendezvous
always perhaps towards besides sometimes upstairs downstairs
overseas indoors outdoors alas whereas nowadays thereabouts anyways
""".split())

_LEMMA_RULES = (
    ("sses", "ss"), ("ches", "ch"), ("shes", "sh"), ("xes", "x"),
    ("zes", "z"), ("ies", "y"), ("ss", "ss"), ("us", "us"), ("is", "is"),
    ("s", ""),
)


# per-process memo: vocabulary is Zipfian, so the cache hit rate is high
# and the dict stays bounded by distinct-token count; the size cap keeps a
# pathological corpus (random strings) from growing it without bound.
_LEMMA_CACHE: dict[str, str] = {}
_LEMMA_CACHE_MAX = 1 << 20


def lemmatize(word: str) -> str:
    cached = _LEMMA_CACHE.get(word)
    if cached is not None:
        return cached
    if word in _LEMMA_EXCEPTIONS:
        out = _LEMMA_EXCEPTIONS[word]
    elif word in _LEMMA_KEEP:
        out = word
    else:
        out = word
        for suffix, repl in _LEMMA_RULES:
            if word.endswith(suffix):
                stem = word[: len(word) - len(suffix)] + repl
                if len(stem) >= 2:
                    out = stem
                break
    if len(_LEMMA_CACHE) < _LEMMA_CACHE_MAX:
        _LEMMA_CACHE[word] = out
    return out


def ngrams(tokens: list[str], n: int) -> list[str]:
    """Space-joined n-grams (Tokenizer.py:25-27 via nltk.ngrams)."""
    if n <= 0 or len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def tokenize(text: str, ngram_max: int = 3) -> list[str]:
    """Document tokenizer — reference ``tokenize`` (Tokenizer.py:19-29).

    lower → tübingen-normalize → word split → keep isalnum & not-stopword
    (checked on the *un-lemmatized* token) → lemmatize → emit 1..n-grams.
    """
    text = normalize_tuebingen(text.lower())
    tokens = word_tokenize(text)
    cleaned = [
        lemmatize(t) for t in tokens
        if t.isalnum() and t not in ENGLISH_STOPWORDS
    ]
    out: list[str] = []
    for n in range(1, ngram_max + 1):
        out.extend(ngrams(cleaned, n))
    return out


# ---------------------------------------------------------------------------
# Query tokenizer (Tokenizer.py:31-78 semantics)
# ---------------------------------------------------------------------------

# Deterministic stand-in for the first-WordNet-synset expansion
# (Tokenizer.py:65-70). Small embedded table; lemmas inserted after the
# source word exactly like the reference's insert(i+1, ...) loop.
SYNONYMS: dict[str, tuple[str, ...]] = {
    "hotel": ("inn", "lodge"),
    "food": ("nutrient",),
    "restaurant": ("eatery",),
    "university": ("college",),
    "castle": ("palace",),
    "city": ("town", "metropolis"),
    "museum": ("gallery",),
    "river": ("stream",),
    "fast": ("quick", "speedy"),
    "query": ("question",),
    # widened with single-word lemmas of the words' first WordNet noun
    # synsets (public data, vendored as literals — the T5/WordNet
    # expansion itself stays a documented stand-in)
    "car": ("auto", "automobile", "motorcar"),
    "doctor": ("doc", "physician", "medico"),
    "movie": ("film", "picture"),
    "town": ("township",),
    "student": ("pupil", "educatee"),
    "teacher": ("instructor",),
    "lawyer": ("attorney",),
    "shop": ("store",),
    "bicycle": ("bike", "wheel", "cycle"),
    "forest": ("wood", "woods"),
    "mountain": ("mount",),
    "rain": ("rainfall",),
    "snow": ("snowfall",),
    "road": ("route",),
}


def spell_correct(word: str) -> str:
    """Identity stand-in for pyspellchecker (Tokenizer.py:36-41).

    pyspellchecker's bundled English frequency dictionary is not in this
    container, so the default query path does no correction (documented
    divergence, BASELINE.md "Parity scope"). ``spell_correct_vocab``
    below provides the same Norvig-style candidate model against a
    caller-supplied vocabulary (e.g. the index's unigram term_stats)
    for deployments that want correction without the package.
    """
    return word


def _edits1(word: str) -> set[str]:
    letters = "abcdefghijklmnopqrstuvwxyzäöüß"
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = {a + b[1:] for a, b in splits if b}
    transposes = {a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1}
    replaces = {a + c + b[1:] for a, b in splits if b for c in letters}
    inserts = {a + c + b for a, b in splits for c in letters}
    return deletes | transposes | replaces | inserts


def spell_correct_vocab(word: str, vocab: dict[str, int]) -> str:
    """Norvig-style correction against a frequency vocabulary
    (pyspellchecker's public algorithm: known word wins, else the
    highest-frequency known candidate at edit distance 1, else 2, else
    the word unchanged). Deterministic tie-break: frequency desc, then
    lexicographic. ``vocab`` maps word → frequency (e.g. term → df from
    the index's unigram term_stats)."""
    if not word or word in vocab:
        return word
    e1 = _edits1(word)
    known = [w for w in e1 if w in vocab]
    if not known:
        known = [w for c in e1 for w in _edits1(c) if w in vocab]
    if not known:
        return word
    return min(known, key=lambda w: (-vocab[w], w))


def tokenize_query(query: str, ngram_max: int = 3,
                   max_length_before_ngram: int = 40) -> list[str]:
    """Query tokenizer — reference ``tokenize_query`` (Tokenizer.py:31-78).

    lower → word split → spell-correct → drop tübingen variants unless that
    empties the query → stopword+lemmatize with two fallback levels →
    synonym expansion inserted after each word, capped at 40 → 1..3-grams.
    """
    max_length = max_length_before_ngram
    tokens = word_tokenize(query.lower())
    correct_tokens = [spell_correct(w) for w in tokens]

    try_query = [
        t for t in correct_tokens
        if t not in ("tuebingen", "tubingen", "tübingen", "tübinger")
    ]
    q = correct_tokens if not try_query else try_query

    cleaned = [lemmatize(t) for t in q
               if t.isalnum() and t not in ENGLISH_STOPWORDS]
    if cleaned:
        q = cleaned
    else:
        min_clean = [lemmatize(t) for t in q if t.isalnum()]
        q = min_clean if min_clean else [lemmatize(t) for t in q]

    # Quirk replicated: the reference's insertion cursor ``i`` advances only
    # when a synonym is inserted, never per source word (Tokenizer.py:59-70),
    # so synonyms of later words cluster near the front of the query.
    expanded = q.copy()
    i = 0
    for word in q:
        if len(expanded) >= max_length:
            break
        for syn in SYNONYMS.get(word, ()):
            syn_lem = lemmatize(syn)
            if syn_lem != word:
                expanded.insert(i + 1, syn_lem)
                i += 1
    if len(expanded) > max_length:
        expanded = expanded[:max_length]

    out: list[str] = []
    for n in range(1, ngram_max + 1):
        out.extend(ngrams(expanded, n))
    return out


def ngram_query_weight(term: str) -> float:
    """exp(0.29·n_words − 0.336) (BM25Ranker.py:57)."""
    return math.exp(0.29 * len(term.split(" ")) - 0.336)


# ---------------------------------------------------------------------------
# SimHash (Document.py:155-180 semantics)
# ---------------------------------------------------------------------------

_MD5_CACHE: dict[str, bytes] = {}
_MD5_CACHE_MAX = 1 << 20


def _md5_digest(token: str) -> bytes:
    """Memoized md5 digest per token (Zipfian vocab — see _LEMMA_CACHE)."""
    d = _MD5_CACHE.get(token)
    if d is None:
        d = hashlib.md5(token.encode("utf-8")).digest()
        if len(_MD5_CACHE) < _MD5_CACHE_MAX:
            _MD5_CACHE[token] = d
    return d


def simhash128(tokens: list[str]) -> int:
    """128-bit SimHash with the reference's occurrence×tf weighting quirk.

    The reference iterates over every token *occurrence* and weights each
    occurrence by the token's total tf (Document.py:164-176) — a distinct
    token with tf=k therefore contributes k·k times its bit pattern. We
    replicate exactly (weight = tf² per distinct token).
    """
    if not tokens:
        return 0
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    # vectorized bit matrix: md5 digest bytes are big-endian, so
    # np.unpackbits (MSB-first) column c == (int(hexdigest,16) >> (127-c)) & 1
    import numpy as np
    digests = b"".join(_md5_digest(t) for t in tf)
    bits = np.unpackbits(
        np.frombuffer(digests, dtype=np.uint8).reshape(len(tf), 16), axis=1)
    w = np.fromiter((c * c for c in tf.values()), dtype=np.int64,
                    count=len(tf))
    v = ((bits.astype(np.int64) * 2 - 1) * w[:, None]).sum(axis=0)
    packed = np.packbits((v > 0).astype(np.uint8)).tobytes()
    return int.from_bytes(packed, "big")


def hamming_distance(h1: int, h2: int) -> int:
    """bit_count(h1 ^ h2) (Crawler.py:42-43, DocumentIndex.py:15-16)."""
    return bin(h1 ^ h2).count("1")


def simhash_to_longs(h: int) -> tuple[int, int]:
    """Split a 128-bit simhash into two signed 64-bit halves for Spark."""
    hi = (h >> 64) & 0xFFFFFFFFFFFFFFFF
    lo = h & 0xFFFFFFFFFFFFFFFF
    if hi >= 1 << 63:
        hi -= 1 << 64
    if lo >= 1 << 63:
        lo -= 1 << 64
    return hi, lo


# ---------------------------------------------------------------------------
# Language detection (Document.py:115-141 semantics, langdetect replaced by
# a deterministic stopword-ratio heuristic)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS = {
    "en": ENGLISH_STOPWORDS,
    "de": GERMAN_STOPWORDS,
    "fr": FRENCH_STOPWORDS,
}


def detect_langs(tokens: Iterable[str]) -> dict[str, float]:
    """Deterministic language probabilities from stopword-hit ratios.

    Stand-in for langdetect.detect_langs (Document.py:129); probabilities
    are hit-count shares over the union of per-language stopword hits,
    normalized to sum to 1. Empty input → {}.
    """
    hits = {lang: 0 for lang in _LANG_STOPWORDS}
    total = 0
    for t in tokens:
        total += 1
        for lang, sw in _LANG_STOPWORDS.items():
            if t in sw:
                hits[lang] += 1
    if total == 0:
        return {}
    denom = sum(hits.values())
    if denom == 0:
        # no stopword evidence: deterministic tie-break — ascii-only → en
        return {"en": 0.5}
    return {lang: c / denom for lang, c in hits.items() if c > 0}


def detect_document_language(tokens: list[str],
                             html_lang: str | None) -> str | None:
    """Reference gate semantics (Document.py:115-141).

    +0.33 boost to the <html lang> prefix; English iff round(p_en) > 0.4
    (Python banker's rounding to int — exactly-0.5 rounds to 0 and fails,
    replicated). Otherwise highest-probability language; None if
    undetectable.
    """
    langs = detect_langs(tokens)
    if not langs:
        return None
    if html_lang is not None:
        html_lang = html_lang.split("-")[0]
        if html_lang in langs:
            langs[html_lang] += 0.33
    ordered = sorted(langs.items(), key=lambda kv: kv[1], reverse=True)
    d = dict(ordered)
    if "en" in d and round(d["en"]) > 0.4:
        return "en"
    return ordered[0][0]


# ---------------------------------------------------------------------------
# Relevance predicates (Crawler.py:239-254, DocumentIndex.py:75-77,88)
# ---------------------------------------------------------------------------

_URL_VARIANTS = ("tübingen", "tuebingen", "tubingen")


def is_relevant(url: str, language: str | None,
                single_tokens: list[str]) -> bool:
    """Crawler relevance predicate (Crawler.py:239-254).

    en-only; then url-substring OR token match. Note the token check for
    raw variants never fires post-normalization (tokenize maps them all to
    "tübingen") — replicated faithfully by checking the normalized token.
    """
    if language != "en":
        return False
    url_lower = url.lower()
    if any(w in url_lower for w in _URL_VARIANTS):
        return True
    return any(t in ("tübingen", "tuebingen", "tubingen")
               for t in single_tokens)


def index_filter(url: str, is_relevant_flag: bool,
                 single_tokens: list[str]) -> bool:
    """Index-time re-filter (DocumentIndex.py:75-77, 88).

    ``__base_url_relevant`` tests the URL *scheme* for "tübingen" — a latent
    bug that makes it always False; replicated (not fixed) for parity.
    """
    scheme = url.split(":", 1)[0].lower() if ":" in url else ""
    base_url_relevant = "tübingen" in normalize_tuebingen(scheme)
    return base_url_relevant or (is_relevant_flag
                                 and "tübingen" in single_tokens)
