"""Pure-stdlib HTML extraction with the reference's bs4 semantics.

Spec-as-code for the extraction stage; shared by the single-node oracle and
the Spark pandas UDF so extracted text is byte-identical per url by
construction (the driver invariant, BASELINE.json input_hint).

Reference semantics re-expressed (NOT copied) from
``/root/reference/backend/core/Document.py:46-96, 143-153, 207-289``:

* strip ``script/style/link/meta`` elements (Document.py:80-81)
* if a ``<main>`` element exists → ``" ".join(main.stripped_strings)``,
  else the soup-wide ``get_text()`` concatenation (Document.py:84-88)
* title = text of the first ``<title>`` (Document.py:68)
* description = first ``<meta name=description>`` else first
  ``<meta property=og:description>`` (Document.py:143-153)
* keywords = every ``<meta name=keywords>``, comma-split, strip+lower
  (Document.py:283-289)
* headings h1..h6 → list of ``get_text(strip=True)`` (Document.py:269-275)
* emphasis groups bold/italic/underline/strike (Document.py:277-281)
* icon: first link rel ∈ (shortcut icon, icon, apple-touch-icon),
  absolutized (Document.py:243-255)
* links: all ``<a href>``; absolute kept, relative joined to the page's
  base url; de-duplicated (Document.py:207-219)
* modified date: ``article:modified_time`` ≻ ``article:published_time``
  meta tags (Document.py:221-241; the Last-Modified *header* source does
  not exist for a static page table)

bs4 is unavailable in this environment, so the mini-DOM below is built on
``html.parser.HTMLParser``; entity decoding (convert_charrefs=True) matches
bs4's html.parser tree builder.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import dateutil.parser

# HTML void elements: never pushed onto the open-element stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent=None):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node or str (text)
        self.parent = parent

    # -- bs4-equivalent accessors ------------------------------------------

    def iter_nodes(self):
        """Pre-order traversal of element nodes (document order).

        Iterative (explicit stack): recursive generators pay a
        yield-through per ancestor level per node — on the extraction
        hot path that was ~18% of per-page CPU (profiled).
        """
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children)
                         if isinstance(c, Node))

    def find_all(self, tags) -> list["Node"]:
        if isinstance(tags, str):
            tags = (tags,)
        tagset = set(tags)
        return [n for n in self.iter_nodes() if n.tag in tagset]

    def find(self, tag: str, attrs: dict[str, str] | None = None):
        for n in self.iter_nodes():
            if n.tag == tag and (
                attrs is None
                or all(n.attrs.get(k) == v for k, v in attrs.items())
            ):
                return n
        return None

    def strings(self):
        """All descendant text nodes in document order (bs4 .strings).
        Iterative for the same hot-path reason as ``iter_nodes``."""
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                stack.extend(reversed(c.children))
            else:
                yield c

    def get_text(self, strip: bool = False) -> str:
        text = "".join(self.strings())
        return text.strip() if strip else text

    def stripped_strings(self):
        for s in self.strings():
            s = s.strip()
            if s:
                yield s

    def decompose_tags(self, tags) -> None:
        tagset = set(tags)
        self.children = [
            c for c in self.children
            if not (isinstance(c, Node) and c.tag in tagset)
        ]
        for c in self.children:
            if isinstance(c, Node):
                c.decompose_tags(tagset)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        # close the nearest matching open element (html.parser tolerance)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# URL helpers (Document.py:182-205)
# ---------------------------------------------------------------------------

_URL_RE = re.compile(r"^(https?|ftp)://[^\s/$.?#].[^\s]*$", re.IGNORECASE)


def is_external(url: str) -> bool:
    return url.startswith(("www", "http", "https"))


def get_base_url(url: str) -> str:
    p = urlparse(url)
    return f"{p.scheme}://{p.netloc}"


def get_domain(url: str) -> str:
    return urlparse(url).netloc.replace("www.", "")


def is_valid_url(url: str) -> bool:
    """Deterministic stand-in for Django's URLValidator (Document.py:198-205)."""
    return bool(_URL_RE.match(url))


# ---------------------------------------------------------------------------
# Extraction (Document.py:66-96)
# ---------------------------------------------------------------------------

_EMPHASIS_GROUPS = {
    "bold": ("b", "strong"),
    "italic": ("i", "em"),
    "underline": ("u",),
    "strike": ("s", "strike", "del"),
}


def extract_page(url: str, html: str) -> dict:
    """Full extraction struct for one page. Field-for-field the reference's
    ``Document.__fetch_document_content`` (Document.py:66-96) minus the
    network stages (the input table already carries the html).
    """
    root = parse_html(html)

    # ONE pre-order walk buckets every element by tag; the dozen
    # find/find_all lookups below read the buckets. (Each find_all was a
    # full tree traversal — 12+ walks per page, measured ~15% of
    # extraction CPU.) Document order inside each bucket is preserved,
    # so "first match" semantics are identical to find().
    by_tag: dict[str, list[Node]] = {}
    doc_order: dict[int, int] = {}  # id(node) -> pre-order sequence no.
    for i, n in enumerate(root.iter_nodes()):
        doc_order[id(n)] = i
        bucket = by_tag.get(n.tag)
        if bucket is None:
            by_tag[n.tag] = [n]
        else:
            bucket.append(n)

    def _first(tag: str, attrs: dict | None = None):
        for n in by_tag.get(tag, ()):
            if attrs is None or all(n.attrs.get(k) == v
                                    for k, v in attrs.items()):
                return n
        return None

    html_tag = _first("html")
    html_lang = html_tag.attrs.get("lang") if html_tag is not None else None

    title_node = _first("title")
    title = title_node.get_text() if title_node is not None else ""

    # description (Document.py:143-153)
    description = ""
    d = _first("meta", {"name": "description"})
    if d is not None and "content" in d.attrs:
        description = d.attrs["content"] or ""
    else:
        og = _first("meta", {"property": "og:description"})
        if og is not None and "content" in og.attrs:
            description = og.attrs["content"] or ""

    # keywords (Document.py:283-289)
    keywords: list[str] = []
    for meta in by_tag.get("meta", ()):
        if meta.attrs.get("name") == "keywords":
            content = meta.attrs.get("content") or ""
            keywords.extend(k.strip().lower() for k in content.split(","))

    # modified date (Document.py:221-241, meta-tag sources only)
    last_modified = None
    for prop in ("article:modified_time", "article:published_time"):
        tag = _first("meta", {"property": prop})
        if tag is not None and "content" in tag.attrs:
            try:
                last_modified = dateutil.parser.parse(tag.attrs["content"])
            except (ValueError, OverflowError):
                last_modified = None
            break

    # icon (Document.py:243-255)
    icon_url = None
    for rel in ("shortcut icon", "icon", "apple-touch-icon"):
        link = _first("link", {"rel": rel})
        if link is None or "href" not in link.attrs:
            continue
        href = link.attrs["href"] or ""
        icon_url = href if is_external(href) else urljoin(get_base_url(url), href)
        break

    # headings (Document.py:269-275)
    headings = {
        f"h{level}": [h.get_text(strip=True)
                      for h in by_tag.get(f"h{level}", ())]
        for level in range(1, 7)
    }

    # emphasis (Document.py:277-281) — .text.strip() per element; the
    # multi-tag groups merge buckets back into document order
    def _in_doc_order(tags: tuple[str, ...]) -> list[Node]:
        if len(tags) == 1:
            return list(by_tag.get(tags[0], ()))
        merged = [n for t in tags for n in by_tag.get(t, ())]
        merged.sort(key=lambda n: doc_order[id(n)])
        return merged

    text_emphasis = {
        group: [n.get_text().strip() for n in _in_doc_order(tags)]
        for group, tags in _EMPHASIS_GROUPS.items()
    }

    # links (Document.py:207-219) — set semantics; sorted for
    # determinism. anchor_pairs (extension, same absolutization rules)
    # keeps per-OCCURRENCE (href, anchor text) in document order, so
    # the anchor-field stage never parses the html a second time
    anchor_pairs = _anchor_pairs(by_tag.get("a", ()), url)
    hrefs = {h for h, _ in anchor_pairs}

    # boilerplate strip + text (Document.py:80-90)
    root.decompose_tags(("script", "style", "link", "meta"))
    main = root.find("main")
    if main is None:
        text = root.get_text()
    else:
        text = " ".join(main.stripped_strings())

    return {
        "url": url,
        "html_lang": html_lang,
        "title": title,
        "description": description,
        "keywords": keywords,
        "last_modified": last_modified,
        "icon_url": icon_url,
        "headings": headings,
        "text_emphasis": text_emphasis,
        "links": sorted(hrefs),
        "anchor_pairs": anchor_pairs,
        "text": text,
    }


def _anchor_pairs(a_nodes, url: str) -> list[tuple[str, str]]:
    """Shared ``<a href>`` walk: per-occurrence (absolute_href, anchor
    text) with the links list's absolutization/validity rules
    (Document.py:207-219). ``extract_page``'s ``links`` is exactly the
    sorted href set of these pairs, so both outputs stay consistent by
    construction."""
    out: list[tuple[str, str]] = []
    for a in a_nodes:
        href = a.attrs.get("href")
        if href is None:
            continue
        if is_external(href) and is_valid_url(href):
            absu = href
        else:
            absu = urljoin(get_base_url(url), href)
            if not is_valid_url(absu):
                continue
        out.append((absu, " ".join(a.stripped_strings())))
    return out


def extract_anchor_pairs(url: str, html: str) -> list[tuple[str, str]]:
    """(absolute_href, anchor_text) per ``<a href>`` OCCURRENCE.

    Standalone parse for ad-hoc use; the build pipeline reads the same
    pairs from ``extract_page()['anchor_pairs']`` (one parse per page).
    Each occurrence is kept: two links to the same target are two
    anchor votes, so no set-dedup; document order preserved. Anchor
    text is the link's stripped visible text (space-joined like the
    ``<main>`` text path)."""
    return _anchor_pairs(parse_html(html).find_all("a"), url)


def extracted_text(html: str) -> str:
    """Text-only fast path (same semantics as extract_page()['text'])."""
    root = parse_html(html)
    root.decompose_tags(("script", "style", "link", "meta"))
    main = root.find("main")
    if main is None:
        return root.get_text()
    return " ".join(main.stripped_strings())
