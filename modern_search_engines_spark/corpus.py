"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the engine's input table per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
Every row is a pure function of ``(seed, i)`` — no external data, no RNG
state shared across rows — so any subset/partitioning regenerates
identically (FIXTURES.md §1).

The HTML template grammar covers every extraction path the reference
exercises (/root/reference/backend/core/Document.py:66-96): optional
``<main>``, script/style/link/meta boilerplate, title, description /
og:description, keywords, article:modified_time, h1–h6 headings,
b/strong/i/em/u/s/strike/del emphasis, absolute+relative links,
``<html lang>`` (en/de/absent), a few ``%PDF-`` rows (content sniff,
Document.py:107-109) and oversized rows (Document.py:62-64). Vocabulary is
zipfian so term df is head-skewed (exercises the salted posting merge).

``text`` and ``lang`` columns are the oracle extraction/detection outputs —
the ground truth for the byte-equality and gate-parity tests.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import struct

from . import htmlx, textlib

# Zipfian English vocabulary (rank-weighted sampling below).
EN_VOCAB = (
    "university research castle city town river museum student hotel food "
    "restaurant travel tour bridge market church history science library "
    "festival garden park music art gallery theater cafe bakery cheese "
    "wine beer street square hill forest valley lecture professor course "
    "exam semester campus choir punt boat neckar swabia region culture "
    "tradition market bus train station airport review rating price menu "
    "dish plate room view booking guide map walk trail summit tower wall "
    "gate old new great small ancient modern famous quiet busy local"
).split()

DE_VOCAB = (
    "die der das und eine stadt schloss fluss museum universität student "
    "hotel essen restaurant reise brücke markt kirche geschichte bibliothek "
    "fest garten park musik kunst theater strasse platz wald tal vorlesung "
    "professor kurs semester chor boot region kultur tradition bahnhof "
    "bewertung preis zimmer aussicht führer karte weg turm mauer tor alt neu"
).split()

DOMAINS = (
    "https://www.uni-tuebingen.example", "https://visit-tuebingen.example",
    "https://www.swabia-travel.example", "https://neckar-guide.example",
    "https://www.campus-life.example", "https://old-town-blog.example",
    "https://www.food-reviews.example", "https://hiking-trails.example",
)

_EPOCH = dt.datetime(2022, 1, 1, tzinfo=dt.timezone.utc)


def _h64(seed: int, i: int, salt: str) -> int:
    """Deterministic 64-bit stream: md5(seed|i|salt)."""
    d = hashlib.md5(f"{seed}:{i}:{salt}".encode()).digest()
    return struct.unpack("<Q", d[:8])[0]


def _pick(seed: int, i: int, salt: str, options):
    return options[_h64(seed, i, salt) % len(options)]


def _zipf_word(seed: int, i: int, salt: str, vocab) -> str:
    """Zipf(~1.0) rank sampling via inverse-CDF over harmonic weights."""
    u = (_h64(seed, i, salt) % 10**9) / 10**9
    n = len(vocab)
    # cheap inverse: rank ∝ exp(u * ln n) spreads mass toward low ranks
    rank = int(n ** u) - 1
    return vocab[max(0, min(rank, n - 1))]


def _sentence(seed: int, i: int, j: int, vocab, n_words: int) -> str:
    return " ".join(
        _zipf_word(seed, i, f"w{j}:{k}", vocab) for k in range(n_words)
    )


def make_page(seed: int, i: int, *, oversize: bool = False,
              pdf: bool = False) -> dict:
    """One deterministic page row: url, warc_ts, html(bytes), text, lang."""
    domain = _pick(seed, i, "dom", DOMAINS)
    in_url_tueb = _h64(seed, i, "urlt") % 20 == 0  # ~5%
    slug = f"page-{i}" + ("-tuebingen" if in_url_tueb else "")
    url = f"{domain}/{slug}.html"

    warc_ts = _EPOCH + dt.timedelta(
        seconds=int(_h64(seed, i, "ts") % (3 * 365 * 86400))
    )

    if pdf:
        html_b = b"%PDF-1.7 " + _sentence(seed, i, 0, EN_VOCAB, 30).encode()
        return {"url": url, "warc_ts": warc_ts, "html": html_b,
                "text": "", "lang": None}

    german = _h64(seed, i, "lang") % 5 == 0  # ~20% German pages
    vocab = DE_VOCAB if german else EN_VOCAB
    html_lang_mode = _h64(seed, i, "hl") % 3  # 0: correct, 1: absent, 2: en
    lang_attr = (
        "" if html_lang_mode == 1
        else f' lang="{"de" if german and html_lang_mode == 0 else "en"}"'
    )

    mentions_tueb = (not german) and _h64(seed, i, "tueb") % 5 != 0  # ~80% en
    n_paras = 2 + _h64(seed, i, "np") % 4
    paras = []
    for j in range(n_paras):
        s = _sentence(seed, i, j, vocab, 12 + _h64(seed, i, f"len{j}") % 25)
        if mentions_tueb and j == _h64(seed, i, "tp") % n_paras:
            variant = _pick(seed, i, "tv",
                            ("tübingen", "tuebingen", "tubingen", "Tübingen"))
            s = f"{variant} {s}"
        paras.append(s)

    title = _sentence(seed, i, 100, vocab, 3 + _h64(seed, i, "tl") % 3).title()
    desc = _sentence(seed, i, 101, vocab, 8)
    kw = ", ".join(_zipf_word(seed, i, f"kw{k}", vocab) for k in range(4))
    h1 = _sentence(seed, i, 102, vocab, 3)
    h2 = _sentence(seed, i, 103, vocab, 4)
    bold = _zipf_word(seed, i, "b0", vocab)
    em = _zipf_word(seed, i, "e0", vocab)

    use_main = _h64(seed, i, "main") % 2 == 0
    use_og = _h64(seed, i, "og") % 4 == 0
    has_date = _h64(seed, i, "hd") % 3 != 0  # ~2/3 dated
    mod_ts = _EPOCH + dt.timedelta(
        seconds=int(_h64(seed, i, "mts") % (3 * 365 * 86400))
    )

    head = [f'<html{lang_attr}><head><title>{title}</title>']
    if use_og:
        head.append(f'<meta property="og:description" content="{desc}">')
    else:
        head.append(f'<meta name="description" content="{desc}">')
    head.append(f'<meta name="keywords" content="{kw}">')
    if has_date:
        head.append('<meta property="article:modified_time" '
                    f'content="{mod_ts.strftime("%Y-%m-%dT%H:%M:%S+00:00")}">')
    head.append('<link rel="icon" href="/favicon.ico">')
    head.append('<style>body { color: black; }</style>')
    head.append('<script>var tracker = "ignore me";</script>')
    head.append("</head><body>")

    body = [f"<h1>{h1}</h1>", f"<h2>{h2}</h2>"]
    body.append(f"<p>{paras[0]} <b>{bold}</b> <em>{em}</em></p>")
    for p in paras[1:]:
        body.append(f"<p>{p}</p>")
    body.append(f'<a href="/page-{(i * 7) % 1000}.html">internal</a>')
    body.append(f'<a href="{_pick(seed, i, "ld", DOMAINS)}/x.html">ext</a>')
    content = "".join(body)

    if use_main:
        content = (f"<nav>boilerplate navigation chrome</nav>"
                   f"<main>{content}</main><footer>footer chrome</footer>")

    if oversize:
        content += "<p>" + ("padding " * 800_000) + "</p>"  # >5e6 chars

    html = "".join(head) + content + "</body></html>"
    html_b = html.encode("utf-8")

    # ground truth via the shared oracle routines
    text = htmlx.extracted_text(html)
    tokens = textlib.tokenize(text, 1)
    lang = textlib.detect_document_language(
        tokens, ("de" if german and html_lang_mode == 0 else "en")
        if html_lang_mode != 1 else None)
    return {"url": url, "warc_ts": warc_ts, "html": html_b,
            "text": text, "lang": lang}


def generate_pages(n: int, seed: int = 42, n_pdf: int = 0,
                   n_oversize: int = 0) -> list[dict]:
    """n regular rows + n_pdf sniff-reject rows + n_oversize size-gate rows."""
    rows = [make_page(seed, i) for i in range(n)]
    rows += [make_page(seed, n + i, pdf=True) for i in range(n_pdf)]
    rows += [make_page(seed, n + n_pdf + i, oversize=True)
             for i in range(n_oversize)]
    return rows


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_df(spark, n: int, seed: int = 42, n_pdf: int = 0,
             n_oversize: int = 0, num_partitions: int | None = None):
    """Distributed generation: rows are built on executors from (seed, i) so
    corpus creation itself scales (no driver-side materialization)."""
    import pandas as pd  # noqa: F401  (arrow path)
    from pyspark.sql import functions as F

    total_ids = spark.range(0, n + n_pdf + n_oversize,
                            numPartitions=num_partitions)

    def gen(it):
        import pandas as pd
        for batch in it:
            ids = batch["id"].tolist()
            rows = []
            for i in ids:
                if i < n:
                    r = make_page(seed, i)
                elif i < n + n_pdf:
                    r = make_page(seed, i, pdf=True)
                else:
                    r = make_page(seed, i, oversize=True)
                rows.append(r)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                              "text", "lang"])

    return total_ids.mapInPandas(gen, schema=PAGES_SCHEMA)
