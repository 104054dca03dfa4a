"""LaTeX source → plain text (detex-style), pure Python.

arXiv documents are born as TeX; the reference pipeline extracted
from the *rendered* PDF/PS, but a corpus builder ingesting arXiv
source tarballs needs the same plain-text contract straight from the
markup (the detex/opendetex lineage of tools). This is a staged
regex pipeline over the controlled macro subset that dominates real
papers — not a TeX interpreter:

1. cut to the ``\\begin{document}`` … ``\\end{document}`` body (when
   present — fragments work too);
2. protect escaped specials (``\\%`` etc.), then strip ``%`` comments;
3. drop non-prose blocks whole: display-math environments
   (equation/align/displaymath/eqnarray/gather/multline + starred),
   figure/table/tikzpicture/verbatim/lstlisting bodies, inline math
   (``$…$``, ``$$…$$``, ``\\(...\\)``, ``\\[...\\]``);
4. drop reference-machinery commands with their arguments
   (``\\cite``/``\\ref``/``\\label``/``\\includegraphics``/preamble
   declarations/``\\footnote``…);
5. unwrap text-carrying commands to their argument (sectioning on
   its own line; ``\\emph``/``\\textbf``/… inline);
6. drop any remaining ``\\command`` token, strip stray braces,
   restore escapes, normalize whitespace line-by-line.

The output contract is newline-joined non-empty lines — the same
shape the PDF/PS extractors feed the span pipeline. Junk input never
raises; unknown macros degrade to dropped tokens, never to leaked
markup. Deterministic by construction (fixtures plant macros and
state the closed-form expectation).
"""

import re
from typing import List

# escaped specials → sentinels (private-use plane) → literals
_ESCAPES = [
    (r"\%", "\ue000", "%"),
    (r"\&", "\ue001", "&"),
    (r"\_", "\ue002", "_"),
    (r"\#", "\ue003", "#"),
    (r"\$", "\ue004", "$"),
    (r"\{", "\ue005", "{"),
    (r"\}", "\ue006", "}"),
]

_DROP_ENVS = (
    "equation", "align", "displaymath", "eqnarray", "gather",
    "multline", "figure", "table", "tabular", "tikzpicture",
    "verbatim", "lstlisting",
)
_DROP_ENV_RE = re.compile(
    r"\\begin\{(" + "|".join(_DROP_ENVS) + r")\*?\}"
    r".*?"
    r"\\end\{\1\*?\}",
    re.DOTALL,
)
# commands whose argument(s) are machinery, not prose
_DROP_CMD_RE = re.compile(
    r"\\(?:cite[tp]?\*?|ref|eqref|pageref|label|bibliography"
    r"|bibliographystyle|includegraphics|usepackage|documentclass"
    r"|input|include|footnote|vspace|hspace|setlength|newcommand"
    r"|renewcommand|def)\s*(?:\[[^\]]*\])?(?:\{[^{}]*\})?"
)
_SECTION_RE = re.compile(
    r"\\(?:part|chapter|section|subsection|subsubsection|paragraph"
    r"|subparagraph)\*?\s*\{([^{}]*)\}"
)
# text-carrying wrappers: keep the argument (innermost-first loop)
_UNWRAP_RE = re.compile(
    r"\\(?:emph|textbf|textit|texttt|textsc|textrm|textsf|underline"
    r"|mbox|text|title|author|uppercase|lowercase)\s*\{([^{}]*)\}"
)
_INLINE_MATH_RE = re.compile(
    r"\$\$.*?\$\$|\$[^$]*\$|\\\(.*?\\\)|\\\[.*?\\\]", re.DOTALL)
_CMD_TOKEN_RE = re.compile(r"\\[A-Za-z@]+\s*|\\[^A-Za-z\s]")


def extract_tex_text(src: str) -> str:
    """Plain text of one LaTeX source: newline-joined non-empty,
    whitespace-collapsed lines with markup removed per module doc."""
    if not src:
        return ""
    # body cut
    m = re.search(r"\\begin\{document\}", src)
    if m:
        src = src[m.end():]
        m = re.search(r"\\end\{document\}", src)
        if m:
            src = src[:m.start()]
    # protect escapes before comment/math handling
    for esc, sentinel, _lit in _ESCAPES:
        src = src.replace(esc, sentinel)
    # comments: % to end of line (escaped % is a sentinel by now)
    src = re.sub(r"%[^\n]*", "", src)
    src = _DROP_ENV_RE.sub("\n", src)
    src = _INLINE_MATH_RE.sub(" ", src)
    src = src.replace("\\\\", "\n")
    src = _DROP_CMD_RE.sub(" ", src)
    src = _SECTION_RE.sub(lambda m: "\n" + m.group(1) + "\n", src)
    for _ in range(4):  # unwrap nested wrappers innermost-first
        src, n = _UNWRAP_RE.subn(lambda m: m.group(1), src)
        if not n:
            break
    src = _CMD_TOKEN_RE.sub(" ", src)
    src = src.replace("{", " ").replace("}", " ")
    src = src.replace("~", " ")
    for _esc, sentinel, lit in _ESCAPES:
        src = src.replace(sentinel, lit)
    lines = [re.sub(r"[ \t\r\f]+", " ", ln).strip()
             for ln in src.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def make_simple_tex(paragraphs: List[str], plant_markup: bool = True
                    ) -> str:
    """Deterministic LaTeX fixture: a real preamble, one body line per
    paragraph, and (with ``plant_markup``) droppable decorations —
    comments, inline/display math, cite/ref machinery, a figure
    environment — planted between lines. ``extract_tex_text`` must
    return exactly ``"\\n".join(paragraphs)``."""
    out = [
        r"\documentclass[11pt]{article}",
        r"\usepackage{amsmath}",
        r"\newcommand{\foo}{bar}",
        r"\begin{document}",
    ]
    for k, p in enumerate(paragraphs):
        if plant_markup:
            out.append(f"% comment line {k}")
            if k % 2 == 0:
                out.append(r"\begin{equation} E = mc^2 \end{equation}")
            if k % 3 == 0:
                out.append(r"$ x_{%d} + y $ \cite{ref%d}" % (k, k))
        out.append(p)
        if plant_markup and k % 2 == 1:
            out.append(
                r"\begin{figure}\includegraphics{f%d.png}\end{figure}"
                % k)
    out.append(r"\end{document}")
    out.append(r"trailing junk after end is ignored")
    return "\n".join(out)
