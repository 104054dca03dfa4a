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


_DIGIT_RUN = re.compile(r"\d+")


def strip_page_furniture(pages, min_page_frac: float = 0.5,
                         probe_lines: int = 3):
    """Remove running headers/footers and page numbers from a list of
    per-page texts: a line in the top/bottom ``probe_lines`` of a page
    is dropped when its digit-normalized form ("Page 3" → "Page #")
    repeats in the same zone on >= ``min_page_frac`` of pages.

    The positional repeated-line heuristic poppler/pdfminer layout
    analysis applies (reference analogue: the pdf2txt -A retry,
    extractor/fulltext/fulltext.py:112-130, whose positional pass
    exists to undo exactly this page furniture). Documents under 3
    pages are returned untouched — repetition is meaningless there.

    Returns ``(cleaned_pages, n_lines_dropped)``.
    """
    if len(pages) < 3:
        return list(pages), 0

    def norm(s: str) -> str:
        return _DIGIT_RUN.sub("#", s.strip())

    from collections import Counter

    head_counts, tail_counts = Counter(), Counter()
    for page in pages:
        lines = page.splitlines()
        for s in {norm(x) for x in lines[:probe_lines] if x.strip()}:
            head_counts[s] += 1
        for s in {norm(x) for x in lines[-probe_lines:] if x.strip()}:
            tail_counts[s] += 1
    threshold = max(2, int(-(-min_page_frac * len(pages) // 1)))
    drop_head = {s for s, c in head_counts.items() if c >= threshold}
    drop_tail = {s for s, c in tail_counts.items() if c >= threshold}

    cleaned, dropped = [], 0
    for page in pages:
        lines = page.splitlines()
        keep = []
        for i, x in enumerate(lines):
            if x.strip():
                nx = norm(x)
                if (i < probe_lines and nx in drop_head) or \
                        (i >= len(lines) - probe_lines
                         and nx in drop_tail):
                    dropped += 1
                    continue
            keep.append(x)
        cleaned.append("\n".join(keep))
    return cleaned, dropped
