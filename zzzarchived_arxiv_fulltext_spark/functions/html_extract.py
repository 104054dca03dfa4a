"""HTML main-content extraction (stdlib only).

The north rule's web-document leg: strip HTML boilerplate and keep the
main content via DOM heuristics. Pure Python on ``html.parser`` so it
runs in executor workers with zero provisioning:

- structural boilerplate subtrees are dropped wholesale
  (``nav``/``header``/``footer``/``aside``/``form``/``menu``), as are
  non-content subtrees (``script``/``style``/``noscript``/``svg``/
  ``template``);
- remaining text is grouped into blocks at block-element boundaries;
- per-block LINK DENSITY (anchor chars / total chars) drops residual
  navigation clusters (link farms, breadcrumb rows, "related posts")
  — the classic readability/boilerpipe signal;
- whitespace is normalized within a block; blocks join with newlines.

Deterministic by construction (no randomness, no scoring ties): the
same document always yields the same extraction, which is what makes
the Spark stage oracle-checkable.
"""

import re
from html.parser import HTMLParser
from typing import List

_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "head"}
)
_BOILER_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "menu", "button"}
)
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "ul", "ol",
     "table", "tr", "td", "th", "blockquote", "pre", "br", "hr",
     "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption"}
)
_WS_RE = re.compile(r"\s+")

DEFAULT_MAX_LINK_DENSITY = 0.5


class _Block:
    __slots__ = ("chars", "link_chars")

    def __init__(self):
        self.chars: List[str] = []
        self.link_chars: int = 0


class _MainTextParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.boiler_depth = 0
        self.anchor_depth = 0
        self.blocks: List[_Block] = []
        self.cur = _Block()

    def _flush(self):
        if self.cur.chars:
            self.blocks.append(self.cur)
            self.cur = _Block()

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self.drop_depth += 1
        elif tag in _BOILER_TAGS:
            self.boiler_depth += 1
        elif tag == "a":
            self.anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and self.drop_depth:
            self.drop_depth -= 1
        elif tag in _BOILER_TAGS and self.boiler_depth:
            self.boiler_depth -= 1
        elif tag == "a" and self.anchor_depth:
            self.anchor_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self.drop_depth or self.boiler_depth:
            return
        if not data.strip():
            return
        self.cur.chars.append(data)
        if self.anchor_depth:
            self.cur.link_chars += len(data.strip())


def extract_main_text(
    html: str, max_link_density: float = DEFAULT_MAX_LINK_DENSITY
) -> str:
    """Main-content plain text: boilerplate-free blocks, one per line."""
    if not html:
        return ""
    parser = _MainTextParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    parser._flush()
    out = []
    for block in parser.blocks:
        text = _WS_RE.sub(" ", "".join(block.chars)).strip()
        if not text:
            continue
        if block.link_chars / max(len(text), 1) > max_link_density:
            continue
        out.append(text)
    return "\n".join(out)


class _SpanParser(_MainTextParser):
    """Document-order (text block | media) event stream.

    Extends the main-content parser with media capture: ``img`` /
    ``video`` / ``audio`` / ``embed`` elements (and ``source``
    children) emit a media event at their true document position,
    splitting the surrounding text block so the interleaving is
    preserved. Media inside dropped or boilerplate subtrees is
    boilerplate too (a logo in the nav bar is not content).
    """

    _MEDIA_TAGS = frozenset({"img", "video", "audio", "embed", "source"})

    def __init__(self):
        super().__init__()
        self.events: List[tuple] = []  # ('text', _Block) | ('media', src)

    def _flush(self):
        if self.cur.chars:
            self.events.append(("text", self.cur))
            self.blocks.append(self.cur)
            self.cur = _Block()

    def handle_starttag(self, tag, attrs):
        if tag in self._MEDIA_TAGS and not (
            self.drop_depth or self.boiler_depth
        ):
            src = dict(attrs).get("src")
            if src and not src.startswith("data:"):
                self._flush()
                self.events.append(("media", src))
        super().handle_starttag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        # void elements (img) arrive here when self-closed
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)


def extract_main_spans(
    html: str,
    base_url: str = None,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> List[dict]:
    """Main content as an INTERLEAVED span sequence.

    Returns ``[{kind, text, media_ref, offset}, ...]`` — text blocks
    (same boilerplate/link-density rules as :func:`extract_main_text`)
    and media references at their true document positions, offsets
    dense in document order. This is the web-document producer for the
    ``(doc_id, spans)`` input table (BASELINE.json input_hint);
    reference analogue: the span interleaving the extraction task
    preserved around its text transform (``fulltext/extract.py``).
    Malformed markup yields the events parsed so far, never raises.
    """
    from urllib.parse import urljoin

    if not html:
        return []
    parser = _SpanParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return []
    parser._flush()
    spans: List[dict] = []
    for kind, payload in parser.events:
        if kind == "text":
            text = _WS_RE.sub(" ", "".join(payload.chars)).strip()
            if not text:
                continue
            if payload.link_chars / max(len(text), 1) > max_link_density:
                continue
            spans.append({"kind": "text", "text": text,
                          "media_ref": None, "offset": len(spans)})
        else:
            ref = payload
            if base_url:
                try:
                    ref = urljoin(base_url, ref)
                except ValueError:
                    pass
            spans.append({"kind": "media", "text": None,
                          "media_ref": ref, "offset": len(spans)})
    return spans


class _MetaParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts: List[str] = []
        self.in_title = 0
        self.lang = None
        self.canonical = None
        self.robots = None
        self.n_links = 0
        self.n_images = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "html" and self.lang is None:
            self.lang = a.get("lang")
        elif tag == "title":
            self.in_title += 1
        elif tag == "a" and a.get("href"):
            self.n_links += 1
        elif tag == "img":
            self.n_images += 1
        elif tag == "link" and a.get("rel") == "canonical":
            self.canonical = a.get("href")
        elif tag == "meta" and (a.get("name") or "").lower() == "robots" \
                and self.robots is None:
            self.robots = a.get("content")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "title" and self.in_title:
            self.in_title -= 1

    def handle_data(self, data):
        if self.in_title:
            self.title_parts.append(data)


def html_metadata(html: str) -> dict:
    """Page metadata: title, declared language, canonical URL, link
    and image counts — the crawl-frontier/quality-triage fields.
    Malformed markup degrades to empty fields, never raises."""
    parser = _MetaParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass
    title = _WS_RE.sub(" ", "".join(parser.title_parts)).strip()
    noindex, nofollow = robots_directives(parser.robots)
    return {
        "title": title,
        "lang": parser.lang,
        "canonical": parser.canonical,
        "robots": parser.robots,
        "noindex": noindex,
        "nofollow": nofollow,
        "n_links": parser.n_links,
        "n_images": parser.n_images,
    }


def robots_directives(content) -> tuple:
    """(noindex, nofollow) from a robots meta content string.

    Case-insensitive, comma/space separated; ``none`` means both
    (robots-exclusion convention). A page with no robots meta is
    indexable — a responsible crawl corpus DROPS noindex pages, the
    consent analogue of the domain blocklist.
    """
    if not content:
        return False, False
    tokens = {t.strip().lower()
              for t in content.replace(",", " ").split()}
    noindex = "noindex" in tokens or "none" in tokens
    nofollow = "nofollow" in tokens or "none" in tokens
    return noindex, nofollow


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.hrefs.append(href)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)


def html_links(html: str, base_url: str = None) -> List[str]:
    """All anchor hrefs in document order, resolved against
    ``base_url`` when given (stdlib urljoin), filtered to http(s).
    The edge-list source for the link graph (weblinks.page_rank);
    malformed markup yields what was parsed so far, never raises.
    """
    from urllib.parse import urldefrag, urljoin

    parser = _LinkParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass
    out = []
    for href in parser.hrefs:
        try:
            url = urljoin(base_url, href) if base_url else href
            url = urldefrag(url)[0]  # fragments are intra-page noise
        except ValueError:
            continue
        if url.startswith(("http://", "https://")):
            out.append(url)
    return out


class _AnchorParser(HTMLParser):
    """(href, anchor text) pairs; nested anchors close the outer one
    (HTML5 tree-builder behavior — anchors cannot nest)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.pairs: List[tuple] = []
        self._href = None
        self._text: List[str] = []

    def _flush(self):
        if self._href is not None:
            self.pairs.append((self._href, "".join(self._text)))
        self._href, self._text = None, []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._flush()
            self._href = dict(attrs).get("href")

    def handle_startendtag(self, tag, attrs):
        if tag == "a":
            self._flush()
            href = dict(attrs).get("href")
            if href:
                self.pairs.append((href, ""))

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)


def html_anchor_texts(html: str, base_url: str = None) -> List[tuple]:
    """(resolved_url, normalized anchor text) pairs in document order
    — the weak-supervision signal retrieval corpora mine (anchor text
    ≈ a human-written query for the target page). Same resolution
    rules as :func:`html_links` (urljoin, fragment strip, http(s)
    only); anchor text is whitespace-normalized and may be ''.
    Malformed markup yields what was parsed so far, never raises.
    """
    from urllib.parse import urldefrag, urljoin

    parser = _AnchorParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass
    parser._flush()
    out = []
    for href, text in parser.pairs:
        if not href:
            continue
        try:
            url = urljoin(base_url, href) if base_url else href
            url = urldefrag(url)[0]
        except ValueError:
            continue
        if url.startswith(("http://", "https://")):
            out.append((url, _WS_RE.sub(" ", text).strip()))
    return out


def link_density(html: str) -> float:
    """Whole-document anchor-chars / text-chars (corpus triage stat)."""
    parser = _MainTextParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return 0.0
    parser._flush()
    total = sum(len(_WS_RE.sub(" ", "".join(b.chars)).strip())
                for b in parser.blocks)
    links = sum(b.link_chars for b in parser.blocks)
    return links / total if total else 0.0
