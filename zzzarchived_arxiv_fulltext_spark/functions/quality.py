"""Extraction-quality statistics and layout-junk stripping.

Behavioral parity: reference ``extractor/fulltext/fulltext.py:17-44``
(junk/stamp regexes, ``average_word_length``) and the quality gate used
at ``fulltext.py:166,173`` (threshold 45).
"""

import re

# Junk sequences that inflate apparent word length: pdfminer CID
# artifacts and repeated-glyph runs. Parity: RE_REPEATS, fulltext.py:18.
JUNK_PATTERN = re.compile(r"(\(cid:\d+\)|lllll|\.\.\.\.\.|\*\*\*\*\*)")

# The arXiv margin stamp, e.g. "arXiv:1701.00001v1 [cs.DB] 1 Jan 2017".
# Parity: RE_STAMP, fulltext.py:17.
STAMP_PATTERN = re.compile(r"(arXiv:.{20,60}\s\d{1,2}\s[A-Z][a-z]{2}\s\d{4})")

# Quality gate: documents whose junk-stripped average word length
# exceeds this are re-tried with layout analysis, then failed.
# Parity: the literal 45 at fulltext.py:166,173.
MAX_AVG_WORD_LENGTH = 45.0


def average_word_length(txt: str) -> float:
    """Average word length after junk stripping.

    Parity: ``average_word_length`` (fulltext.py:27-44): strip junk
    repeats, then chars / (whitespace-words + 1).
    """
    stripped = JUNK_PATTERN.sub("", txt)
    return len(stripped) / (len(stripped.split()) + 1)


# Word-merge artifacts that positional analysis untangles: a lowercase
# letter glued to an uppercase one, and sentence punctuation glued to
# the next word.
_CAMEL_SEAM = re.compile(r"([a-z])([A-Z])")
_PUNCT_SEAM = re.compile(r"([.,;:])(\w)")


def strip_layout_junk(txt: str) -> str:
    """Deterministic stand-in for the reference's layout-analysis retry.

    The reference re-runs extraction with ``pdf2txt -A`` (positional
    analysis; fulltext.py:112-130,169) when the quality gate fails —
    the documented failure mode being "pdf2txt combines many words
    together" (fulltext.py:114-116). Our input is already span-ized
    text, so the retry is restated as a deterministic repair of the
    artifacts positional analysis fixes: CID/repeat junk, the arXiv
    margin stamp, and merged-word seams (lower→Upper transitions,
    punctuation glued to the following word).
    """
    txt = JUNK_PATTERN.sub(" ", txt)
    txt = STAMP_PATTERN.sub(" ", txt)
    txt = _CAMEL_SEAM.sub(r"\1 \2", txt)
    txt = _PUNCT_SEAM.sub(r"\1 \2", txt)
    return txt
