"""HTML extraction semantics tests (SURVEY.md §5.1, reference
Document.py:66-96)."""

from modern_search_engines_spark import htmlx

PAGE = """<html lang="en-GB"><head>
<title>Castle Guide</title>
<meta name="description" content="A guide to the castle.">
<meta name="keywords" content="Castle, Museum , river">
<meta property="article:modified_time" content="2023-05-01T12:00:00+00:00">
<link rel="icon" href="/fav.ico">
<style>p { color: red }</style>
<script>var x = "<b>not bold</b>";</script>
</head><body>
<h1>Old Castle</h1><h2>Visit the museum</h2>
<p>The <b>castle</b> stands by the <em>river</em>.</p>
<u>underlined</u> <del>gone</del>
<a href="/next.html">next</a>
<a href="https://other.example/x.html">other</a>
</body></html>"""

URL = "https://www.site.example/castle.html"


def test_extract_fields():
    ex = htmlx.extract_page(URL, PAGE)
    assert ex["title"] == "Castle Guide"
    assert ex["description"] == "A guide to the castle."
    assert ex["keywords"] == ["castle", "museum", "river"]
    assert ex["icon_url"] == "https://www.site.example/fav.ico"
    assert ex["last_modified"].year == 2023
    assert ex["headings"]["h1"] == ["Old Castle"]
    assert ex["headings"]["h2"] == ["Visit the museum"]
    assert ex["headings"]["h3"] == []
    assert ex["text_emphasis"]["bold"] == ["castle"]
    assert ex["text_emphasis"]["italic"] == ["river"]
    assert ex["text_emphasis"]["underline"] == ["underlined"]
    assert ex["text_emphasis"]["strike"] == ["gone"]
    assert sorted(ex["links"]) == [
        "https://other.example/x.html",
        "https://www.site.example/next.html",
    ]


def test_boilerplate_stripped_from_text():
    ex = htmlx.extract_page(URL, PAGE)
    assert "color: red" not in ex["text"]
    assert "not bold" not in ex["text"]
    assert "castle" in ex["text"]


def test_main_tag_scopes_text():
    html = ("<html><body><nav>chrome here</nav>"
            "<main><p>real   content</p><p>more</p></main>"
            "<footer>foot</footer></body></html>")
    ex = htmlx.extract_page(URL, html)
    # " ".join(stripped_strings) semantics (Document.py:88)
    assert ex["text"] == "real   content more"
    assert "chrome" not in ex["text"]


def test_no_main_full_get_text():
    html = "<html><body><p>a</p>\n<p>b</p></body></html>"
    ex = htmlx.extract_page(URL, html)
    # soup.get_text() keeps inter-tag whitespace (Document.py:86)
    assert ex["text"] == "a\nb"


def test_og_description_fallback():
    html = ('<html><head><meta property="og:description" content="og d">'
            "</head><body>x</body></html>")
    assert htmlx.extract_page(URL, html)["description"] == "og d"


def test_entities_decoded():
    html = "<html><body><p>a &amp; b &lt;c&gt;</p></body></html>"
    assert htmlx.extract_page(URL, html)["text"] == "a & b <c>"


def test_extraction_is_deterministic_bytes():
    a = htmlx.extract_page(URL, PAGE)["text"].encode("utf-8")
    b = htmlx.extract_page(URL, PAGE)["text"].encode("utf-8")
    assert a == b


def test_published_time_fallback():
    html = ('<html><head><meta property="article:published_time" '
            'content="2021-02-03">"</head><body>x</body></html>')
    assert htmlx.extract_page(URL, html)["last_modified"].year == 2021


def test_extracted_text_fast_path_matches():
    assert htmlx.extracted_text(PAGE) == htmlx.extract_page(URL, PAGE)["text"]
