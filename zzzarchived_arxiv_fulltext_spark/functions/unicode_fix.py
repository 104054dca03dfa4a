"""Typographic-unicode normalization.

Behavioral parity: reference ``extractor/fulltext/fixunicode.py:26-108``.
The reference builds its substitution map by parsing a tab-separated
ligature table at import time and then runs every (pattern, replacement)
pair through ``re.subn`` followed by an NFKC pass. We declare the same
mapping as an explicit, pre-compiled rule list instead — same
substitutions, same application order, no import-time string parsing.

All ligature rules are single-codepoint literals, so their relative
order is immaterial; the trailing manual rules (sharp-s, nbsp, quotes,
dashes, middle dot) run after them, and NFKC normalization runs last —
exactly the reference's sequencing (``fixunicode.py:106-108``).
"""

import re
import unicodedata

# Ligature / phonetic-digraph codepoints -> ASCII-ish expansions.
# Parity source: the ligature table at fixunicode.py:26-61 (values there
# are NFKC-normalized at build time; we store the normalized results,
# e.g. U+FB05 'ﬅ' -> NFKC('ſt') == 'st').
_LIGATURES = (
    ("Ꜳ", "AA"), ("ꜳ", "aa"),
    ("Æ", "AE"), ("æ", "ae"),
    ("Ꜵ", "AO"), ("ꜵ", "ao"),
    ("Ꜷ", "AU"), ("ꜷ", "au"),
    ("Ꜹ", "AV"), ("ꜹ", "av"),
    ("Ꜻ", "AV"), ("ꜻ", "av"),
    ("Ꜽ", "AY"), ("ꜽ", "ay"),
    ("ﬀ", "ff"), ("ﬃ", "ffi"), ("ﬄ", "ffl"),
    ("ﬁ", "fi"), ("ﬂ", "fl"),
    ("Œ", "OE"), ("œ", "oe"),
    ("Ꝏ", "OO"), ("ꝏ", "oo"),
    ("ﬆ", "st"), ("ﬅ", "st"),
    ("Ꜩ", "TZ"), ("ꜩ", "tz"),
    ("ᵫ", "ue"),
    ("Ꝡ", "VY"), ("ꝡ", "vy"),
    ("ȸ", "db"),
    ("ʣ", "dz"), ("ʥ", "dʑ"), ("ʤ", "dʒ"),
    ("ʩ", "fŋ"),
    ("Ĳ", "IJ"), ("ĳ", "ij"),
    ("ʪ", "ls"), ("ʫ", "lz"), ("ɮ", "lʒ"),
    ("ȹ", "qp"),
    ("ʨ", "tɕ"), ("ʦ", "ts"), ("ʧ", "tʃ"),
    ("ꭐ", "ui"), ("ꭑ", "ui"),
)

# Manual typography rules appended after the ligature table
# (parity source: fixunicode.py:76-89).
# All rules except sharp-s are single-codepoint substitutions with
# ASCII outputs, so they fold — together with the ligature table —
# into ONE ``str.translate`` pass (C speed, order-free because the
# source codepoints are disjoint and no output can match a rule).
# Sharp-s keeps its regex: the \B guard needs word-boundary context
# (a standalone beta-like sharp-s stays intact).
_SHARP_S = re.compile(r"(\B)ß")

_CHAR_RULES = tuple(_LIGATURES) + (
    ("\xa0", " "),                 # no-break space -> plain space
    ("‘", "'"), ("’", "'"),        # curly single quotes
    ("“", '"'), ("”", '"'),        # curly double quotes
    ("\xad", "-"), ("—", "-"),     # soft hyphen / em dash
    ("\xb7", "*"),                 # middle dot
)

_TRANSLATE = {ord(src): out for src, out in _CHAR_RULES}


def fix_unicode(txt: str) -> str:
    """Replace display ligatures / typographic codepoints, then NFKC.

    Parity: ``fixunicode.fix_unicode`` (fixunicode.py:92-108). Pure
    ASCII is returned untouched — every rule and NFKC itself are
    identity on ASCII, and the check is a C-level flag test.
    """
    if txt.isascii():
        return txt
    txt = _SHARP_S.sub(r"\1ss", txt)
    txt = txt.translate(_TRANSLATE)
    return unicodedata.normalize("NFKC", txt)
