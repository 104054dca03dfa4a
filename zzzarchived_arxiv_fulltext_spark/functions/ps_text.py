"""PostScript → per-page text, pure Python, zero dependencies.

arXiv's early corpus is PostScript, and the reference pipeline's
charter is "PDF/PS → plain text" (its extractor shelled out to
binaries that handled both; see reference extractor/fulltext/
fulltext.py:50-109 for the shape of that contract). This module is
the PS twin of :mod:`pdf_text`: a tokenizer-level interpreter that
executes ONLY the text-producing subset of the language —

- string literals: ``( ... )`` with nesting and the full escape set
  (``\\n \\r \\t \\b \\f \\\\ \\( \\) \\ooo`` and line
  continuations), plus hex strings ``<...>``;
- the show family: ``show``, ``ashow``, ``widthshow``,
  ``awidthshow``, ``kshow``, ``xshow``, ``yshow``, ``xyshow`` — each
  consumes the most recent string operand (arrays/numbers are never
  strings, so "pop the last string" matches every arity above);
- layout: ``moveto`` to a new y starts a new line (the pstotext /
  ps2ascii heuristic); an x-only move inserts a single space;
- ``showpage`` cuts pages; ``image``/``imagemask``/``colorimage``
  are counted per page for interleaved media spans.

Everything else (paths, graphics state, procedures) is skipped — a
full interpreter is not needed to recover reading order from the
regular, generator-produced PS that dominates real corpora (TeX/dvips
emits exactly the moveto/show stream this decodes).

Strings decode as UTF-8 (errors replaced): synthetic fixtures write
UTF-8 bytes with octal escapes, so the round trip is exact for any
valid-UTF-8 text. Junk bytes never raise — malformed input yields
whatever text was recovered (the P2 failure-isolation contract).
"""

from typing import List, Optional, Tuple

_SHOW_OPS = {
    b"show", b"ashow", b"widthshow", b"awidthshow", b"kshow",
    b"xshow", b"yshow", b"xyshow",
}
_IMAGE_OPS = {b"image", b"imagemask", b"colorimage"}
_WS = b" \t\r\n\f\x00"
_DELIM = b"()<>[]{}/%"


def _parse_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at ``data[i] == '('``.

    Returns (decoded bytes, index after the closing paren). Balanced
    unescaped parens nest per the spec; EOF closes implicitly.
    """
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, 1-3 digits
                val, k = 0, 0
                while k < 3 and i < n and 0x30 <= data[i] <= 0x37:
                    val = val * 8 + (data[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
                continue
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                      0x62: 0x08, 0x66: 0x0C}.get(e)
            if mapped is not None:
                out.append(mapped)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:  # \\, \(, \) and anything else: literal next byte
                out.append(e)
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                i += 1
                break
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse ``<hex>`` starting at ``data[i] == '<'`` (not ``<<``)."""
    i += 1
    n = len(data)
    digits = []
    while i < n and data[i] != 0x3E:  # >
        c = data[i]
        if chr(c) in "0123456789abcdefABCDEF":
            digits.append(chr(c))
        i += 1
    if len(digits) % 2:
        digits.append("0")  # spec: odd final digit pads with 0
    out = bytes(int("".join(digits[k:k + 2]), 16)
                for k in range(0, len(digits), 2))
    return out, min(i + 1, n)


class _Page:
    """Line accumulator for one page (moveto-y cuts lines)."""

    def __init__(self):
        self.lines: List[str] = []
        self.buf: Optional[str] = None
        self.last_y: Optional[float] = None
        self.n_images = 0
        self.shown = False  # at least one show op (even of '')

    def moveto(self, x: Optional[float], y: Optional[float]) -> None:
        if self.buf is None:
            self.buf = ""
        elif y is not None and y != self.last_y:
            self.lines.append(self.buf)
            self.buf = ""
        elif self.buf and not self.buf.endswith(" "):
            self.buf += " "  # x-only move: column gap
        if y is not None:
            self.last_y = y

    def show(self, text: str) -> None:
        self.buf = (self.buf or "") + text
        self.shown = True

    def finish(self) -> Optional[str]:
        """Page text, or None when nothing was ever shown (a page of
        pure graphics/movetos is not a text page)."""
        if not self.shown:
            return None
        if self.buf is not None:
            self.lines.append(self.buf)
        return "\n".join(self.lines)


def extract_ps_page_texts(ps: bytes) -> List[str]:
    texts, _ = _extract(ps)
    return texts


def ps_page_image_counts(ps: bytes) -> List[int]:
    """Images shown per page, page order (media-span interleaving)."""
    _, counts = _extract(ps)
    return counts


def _extract(ps: bytes) -> Tuple[List[str], List[int]]:
    pages: List[str] = []
    counts: List[int] = []
    page = _Page()
    strings: List[bytes] = []   # recent string operands, bounded
    nums: List[float] = []      # recent numeric operands, bounded
    i, n = 0, len(ps)
    while i < n:
        c = ps[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = ps.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # (
            s, i = _parse_string(ps, i)
            strings.append(s)
            del strings[:-8]
        elif c == 0x3C:  # < : <<, <~ascii85~>, or hex string
            if ps.startswith(b"<<", i):
                i += 2
            elif ps.startswith(b"<~", i):
                j = ps.find(b"~>", i + 2)
                i = n if j < 0 else j + 2
            else:
                s, i = _parse_hex_string(ps, i)
                strings.append(s)
                del strings[:-8]
        elif c == 0x3E:  # > (from >>)
            i += 1
        elif c in b"[]{}":
            i += 1
        elif c == 0x2F:  # /name
            i += 1
            while i < n and ps[i] not in _WS and ps[i] not in _DELIM:
                i += 1
        else:  # number or executable name
            j = i
            while j < n and ps[j] not in _WS and ps[j] not in _DELIM:
                j += 1
            tok = ps[i:j]
            i = j if j > i else i + 1
            if not tok:
                continue
            try:
                nums.append(float(tok))
                del nums[:-6]
                continue
            except ValueError:
                pass
            if tok in _SHOW_OPS:
                if strings:
                    page.show(strings.pop().decode("utf-8", "replace"))
            elif tok == b"moveto":
                x = nums[-2] if len(nums) >= 2 else None
                y = nums[-1] if nums else None
                page.moveto(x, y)
            elif tok == b"rmoveto":
                dy = nums[-1] if nums else 0.0
                if dy:
                    page.moveto(None, (page.last_y or 0.0) + dy)
                else:
                    page.moveto(nums[-2] if len(nums) >= 2 else None,
                                page.last_y)
            elif tok in _IMAGE_OPS:
                page.n_images += 1
            elif tok == b"showpage":
                text = page.finish()
                if text is not None or page.n_images:
                    pages.append(text or "")
                    counts.append(page.n_images)
                page = _Page()
    text = page.finish()  # trailing content without showpage
    if text is not None:
        pages.append(text)
        counts.append(page.n_images)
    return pages, counts


def _escape(line: str) -> bytes:
    """UTF-8 bytes of ``line`` as a PS string body (specials + every
    non-printable byte octal-escaped)."""
    out = bytearray()
    for b in line.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif 0x20 <= b <= 0x7E:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def make_simple_ps(pages: List[List[str]],
                   images_per_page: Optional[List[int]] = None) -> bytes:
    """Deterministic DSC-conformant PostScript: one ``moveto``/``show``
    pair per line, y stepping down 12pt, ``image`` stanzas appended
    before ``showpage``. The fixture twin of ``make_simple_pdf`` —
    ``extract_ps_page_texts(make_simple_ps(p))`` round-trips exactly.
    """
    out = bytearray(b"%!PS-Adobe-3.0\n" + b"%%%%Pages: %d\n" % len(pages))
    out += b"/Times-Roman findfont 10 scalefont setfont\n"
    for p, lines in enumerate(pages):
        out += b"%%%%Page: %d %d\n" % (p + 1, p + 1)
        y = 720
        for line in lines:
            out += b"72 %d moveto\n(" % y + _escape(line) + b") show\n"
            y -= 12
        for _ in range((images_per_page or [])[p]
                       if images_per_page and p < len(images_per_page)
                       else 0):
            out += (b"gsave 8 8 8 [8 0 0 -8 0 8]"
                    b" {<00ff00ff00ff00ff>} image grestore\n")
        out += b"showpage\n"
    out += b"%%EOF\n"
    return bytes(out)
