"""Line-level tidy pipeline (the arXiv "TidyText" semantics).

Behavioral parity: reference ``fulltext/process/psv.py:64-240``
(itself a port of arXiv::Overlap::TidyText). Each pass below cites the
reference lines whose observable behavior it reproduces; the code is a
fresh implementation (generator-based passes, pre-compiled patterns).

Pipeline order is load-bearing (psv.py:64-100): keyword strip →
whitespace → EOL repair → per-line scalar chain → whitespace → EOL
repair → sentence split → sentence clean.
"""

import re
from typing import Iterable, Iterator, List

# --- stateful line passes ---------------------------------------------------

_ALL_DIGITS = re.compile(r"^\d+$")
_AFFILIATION = re.compile(r"university|institute", re.IGNORECASE)


def drop_boilerplate_lines(lines: Iterable[str]) -> Iterator[str]:
    """Drop arXiv-stamp / journal-template boilerplate lines.

    Parity: ``_remove_Keyword`` (psv.py:127-148). The affiliation rule
    looks at the *previous input line* (kept or not): a digits-only line
    followed by a University/Institute line drops the latter.
    """
    prev = ""
    for line in lines:
        keep = not (
            line.lower().startswith("arxiv")
            or "will be inserted by hand later" in line
            or "was prepared with the aas" in line
            or (_ALL_DIGITS.match(prev) and _AFFILIATION.match(line))
        )
        prev = line
        if keep:
            yield line


_INTRA_WS = re.compile(r"[\n\r\f\t]")


def blank_intra_whitespace(lines: Iterable[str]) -> Iterator[str]:
    """Turn newlines/CR/FF/tabs into spaces, per line.

    Parity: ``_remove_WhiteSpace`` (psv.py:103-108). Idempotent.
    """
    for line in lines:
        yield _INTRA_WS.sub(" ", line)


_TRAILING_HYPHEN = re.compile(r"- $")
_STARTS_LOWER = re.compile(r"^[a-z]")
_SENTENCE_END = re.compile(r"\. $")


def repair_line_breaks(lines: Iterable[str]) -> List[str]:
    """Rejoin hyphenated words and mid-sentence line breaks.

    Parity: ``_remove_BadEOL`` (psv.py:111-124): strip a trailing
    ``"- "``; a line starting lowercase whose predecessor (post-strip)
    is not exactly ``". "`` is concatenated onto the previous output
    line. Output starts with a seed empty line, as in the reference
    (its ``out = ['']``).
    """
    out: List[str] = [""]
    prev = ""
    for line in lines:
        line = _TRAILING_HYPHEN.sub("", line)
        if _STARTS_LOWER.match(line) and not _SENTENCE_END.match(prev):
            out[-1] += line
        else:
            out.append(line)
        prev = line
    return out


# --- per-line scalar chain ---------------------------------------------------

# Abbreviation expansions; parity: ``expandWords`` (psv.py:151-167).
_EXPANSIONS = tuple(
    (re.compile(pat, re.IGNORECASE), repl)
    for pat, repl in (
        (r"Fig[s]?[\.]?\s", "Figure "),
        (r"Eq[s]?[\.]?\s", "Equation "),
        (r"Sect[s]?[\.]?\s", "Section "),
        (r"Ref[s]?[\.]?\s", "Reference "),
        (r"Prof\.", "Prof"),
        (r"Dr\.", "Dr"),
    )
)

# The scalar cleanup chain applied to every line, in order
# (psv.py:86-92). Each entry is (pattern, replacement); patterns are
# applied with global, left-to-right, non-overlapping substitution —
# the same semantics as the reference's sequential ``re.subn`` calls.
_SCALAR_CHAIN = tuple(
    (re.compile(pat), repl)
    for pat, repl in (
        # symbols -> space; parity: _remove_Symbols (psv.py:170-174)
        (r"[^\.\w ]", " "),
        (r"\_", " "),
        # digits -> space; parity: _remove_Numbers (psv.py:177-181)
        (r"\d+[\.]?\d+/", " "),
        (r"\d", " "),
        # dotted abbreviations; parity: _remove_Abbrev (psv.py:184-193)
        (r"\s\w\.\w\.\w\.\s", " "),
        (r"\s\w\.\w\.\s", " "),
        (r"\s\w\.\s", " "),
        # single letters; applied twice to catch overlapping matches;
        # parity: _remove_SingleAlphabet (psv.py:196-201)
        (r"\s[a-zA-Z]\s", " "),
        (r"\s[a-zA-Z]\s", " "),
        (r"\s[a-zA-Z]\.", "."),
        # space collapse; parity: _remove_ExtraSpaces (psv.py:204-208)
        (r"\s+", " "),
        (r"^\s+", ""),
    )
)


def expand_abbreviations(line: str) -> str:
    """Parity: ``expandWords`` (psv.py:151-167)."""
    for pattern, repl in _EXPANSIONS:
        line = pattern.sub(repl, line)
    return line


def scrub_line(line: str) -> str:
    """Expand abbreviations then run the scalar cleanup chain."""
    line = expand_abbreviations(line)
    for pattern, repl in _SCALAR_CHAIN:
        line = pattern.sub(repl, line)
    return line


def collapse_spaces(line: str) -> str:
    """Parity: ``_remove_ExtraSpaces`` (psv.py:204-208)."""
    line = re.sub(r"\s+", " ", line)
    return re.sub(r"^\s+", "", line)


# --- sentence passes ----------------------------------------------------------

_SENTENCE_SPLIT = re.compile(r"\.\s")
_HAS_WORD = re.compile(r"\w")
_NON_WORD = re.compile(r"\W")


def split_sentences(lines: Iterable[str]) -> Iterator[str]:
    """Flatten lines into ``". "``-delimited sentences.

    Parity: ``_split_sentence`` (psv.py:211-216).
    """
    for line in lines:
        yield from _SENTENCE_SPLIT.split(line)


def clean_sentences(lines: Iterable[str]) -> Iterator[str]:
    """Keep word-bearing sentences; strip non-word chars; lowercase.

    Parity: ``_clean_sentence`` (psv.py:219-240): sentence must *start*
    with a word char, length (post-scrub) must exceed 3.
    """
    for line in lines:
        if not _HAS_WORD.match(line):
            continue
        line = collapse_spaces(_NON_WORD.sub(" ", line))
        line = re.sub(r"^\s+", "", line)
        line = re.sub(r"\s+$", "", line)
        if len(line) <= 3:
            continue
        yield line.lower()


# --- the full pipeline --------------------------------------------------------


def tidy_lines(lines: List[str]) -> List[str]:
    """Run the full tidy pipeline over a document's lines.

    Parity: ``tidy_txt_from_pdf`` (psv.py:64-100), including the exact
    pass ordering and the doubled whitespace/EOL passes.
    """
    staged = repair_line_breaks(
        blank_intra_whitespace(drop_boilerplate_lines(lines))
    )
    staged = [scrub_line(line) for line in staged]
    staged = repair_line_breaks(blank_intra_whitespace(staged))
    return list(clean_sentences(split_sentences(staged)))
