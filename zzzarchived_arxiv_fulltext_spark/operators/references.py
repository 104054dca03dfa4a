"""Bibliography mining over extracted full text: split the trailing
References block into entries and mine citation edges.

The reference pipeline STRIPPED references (its psv step exists to cut
them out of the training text, ``psv.py:243-282``); a corpus engine
also wants them as DATA — per-entry rows for metadata linking and an
arXiv-id citation graph that feeds the link-analysis family
(`operators/weblinks.py` PageRank/HITS run unchanged on these edges).

All-JVM: line scan, heading election, entry split, and id extraction
are regexp/array expressions — no Python crossing, no shuffle until
the caller aggregates.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same shape as functions/psv.py:_REFS_HEADING (the parity core), as a
# Spark inline-flag regex: a line that is just "References" /
# "Bibliography" with optional non-letter decoration.
_HEADING_RE = r"^[^a-zA-Z]*(?i)(References?|Bibliography)[^a-zA-Z0-9]*$"

# arXiv identifiers, new style (2007+): arXiv:YYMM.NNNNN; old style:
# archive/YYMMNNN (e.g. hep-th/9901001).
_ARXIV_NEW = r"arXiv:([0-9]{4}\.[0-9]{4,5})"
_ARXIV_OLD = r"\b([a-z-]+(?:\.[A-Z]{2})?/[0-9]{7})\b"


def reference_entries(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_refs_fraction: float = 0.5) -> DataFrame:
    """(doc_id, ref_idx, ref_text): the trailing References block of
    each document split into numbered entries.

    Block detection mirrors the psv contract (psv.py:243-282): the
    LAST heading line wins, and if the block would exceed
    ``max_refs_fraction`` of all lines nothing is extracted (a
    heading mentioned early in the body is not a bibliography).
    Entries are delimited by ``[n]`` markers (the arXiv house style);
    an entry's text may span lines. ``ref_idx`` is the marker's own
    number, not the position — gaps in numbering are preserved
    evidence, not smoothed over.

    Scale shape: one projection computes lines → heading index →
    block → entry array per row (regexp work is per-line inside a
    transform, never a re-split of the full text per element), then
    one explode. Docs without a block produce no rows — dropped BY
    the explode (an ineligible doc's entry array is empty), never by
    a ``where`` on the computed cut: a filter on a derived column
    gets pushed below the projection with the full expression tree
    substituted in, so every row would pay the line split + per-line
    heading regex several times over (guide §4.4's duplicated-
    evaluation trap, JVM edition — measured 4x on the bench corpus).
    """
    lines = F.split(F.col(text_col), "\n")
    base = df.select(F.col(id_col), lines.alias("_lines"))
    cut = F.expr(
        f"array_max(transform(sequence(1, size(_lines)), i -> "
        f"if(element_at(_lines, i) rlike '{_HEADING_RE}', i, 0)))")
    guarded = base.withColumn("_cut", cut).select(
        F.col(id_col), F.col("_lines"),
        F.when(
            (F.col("_cut") > 0)
            & ((F.lit(1.0) - F.col("_cut") / F.size("_lines"))
               <= F.lit(max_refs_fraction)),
            F.col("_cut"),
        ).otherwise(F.lit(0)).alias("_cut"),
    )
    block = F.expr(
        "if(_cut > 0, "
        "array_join(slice(_lines, _cut + 1, size(_lines) - _cut), '\\n'), "
        "'')")
    entries = F.expr(
        r"if(_cut > 0, filter(split(_block, '(?=\\[[0-9]+\\])'), "
        r"e -> e rlike '^\\[[0-9]+\\]'), "
        r"cast(array() as array<string>))")
    return (
        guarded.select(F.col(id_col), F.col("_cut"), block.alias("_block"))
        .select(F.col(id_col), F.explode(entries).alias("_e"))
        .select(
            F.col(id_col),
            F.regexp_extract("_e", r"^\[([0-9]+)\]", 1).cast("int")
            .alias("ref_idx"),
            F.trim(F.regexp_replace(
                F.regexp_replace("_e", r"^\[[0-9]+\]\s*", ""),
                r"\s+", " ")).alias("ref_text"),
        )
    )


def citation_edges(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(src_doc_id, cited_arxiv_id) — distinct arXiv ids mentioned in
    each document's text (new 'arXiv:YYMM.NNNNN' and old
    'archive/YYMMNNN' styles).

    One JVM regexp pass + explode; `distinct` is per (src, cited) —
    map-side combinable. Feed the result to the weblinks PageRank /
    HITS operators for a citation graph: the edge schema matches
    their (src, dst) contract after a rename.
    """
    # SQL string literals eat single backslashes (\b would become a
    # backspace char) — double them at the embed point.
    new_re = _ARXIV_NEW.replace("\\", "\\\\")
    old_re = _ARXIV_OLD.replace("\\", "\\\\")
    ids = F.array_union(
        F.expr(f"regexp_extract_all({text_col}, '{new_re}', 1)"),
        F.expr(f"regexp_extract_all({text_col}, '{old_re}', 1)"),
    )
    return (
        df.select(F.col(id_col).alias("src_doc_id"),
                  F.explode(ids).alias("cited_arxiv_id"))
        .distinct()
    )


# Numbered section heading: "1 Introduction", "2.3 Results", "4. Discussion".
_SECTION_RE = r"^[0-9]+(\.[0-9]+)*\.?\s+\S.*$"


def section_segments(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sec_idx, heading, n_lines, n_words): the document cut
    at numbered section headings (the arXiv house style — ``1
    Introduction``, ``2.3 Results``, ``4. Discussion``).

    ``sec_idx`` 0 is the preamble (title/abstract text before the
    first heading; emitted only when non-empty, with heading ``''``),
    then one row per heading in document order: ``heading`` is the
    trimmed heading line, ``n_lines``/``n_words`` count the section
    BODY (heading line excluded; words are whitespace tokens). A
    document with no headings yields a single preamble row covering
    everything — every doc produces >= 1 row.

    Complements ``reference_entries``: that mines the bibliography
    tail, this maps the body structure (per-section length profiles
    feed quality gates — e.g. missing-introduction or
    acknowledgments-only extractions).

    Scale shape: one projection builds lines -> heading cut indexes ->
    per-section (start, end) structs, then a single explode; counting
    is slice + aggregate inside the same projection. No shuffle, no
    Python.
    """
    lines = F.split(F.col(text_col), "\n")
    base = df.select(F.col(id_col), lines.alias("_lines"))
    sec_re = _SECTION_RE.replace("\\", "\\\\")
    # 1-based indexes of heading lines, in order
    cuts = F.expr(
        f"filter(transform(sequence(1, size(_lines)), i -> "
        f"if(element_at(_lines, i) rlike '{sec_re}', i, 0)), "
        f"i -> i > 0)")
    # struct per section: (sec_idx, heading_line_idx, body_start, body_end)
    segs = F.expr(
        "transform(sequence(0, size(_cuts)), j -> named_struct("
        "  'sec_idx', j,"
        "  'hline', if(j = 0, 0, element_at(_cuts, j)),"
        "  'start', if(j = 0, 1, element_at(_cuts, j) + 1),"
        "  'end', if(j = size(_cuts), size(_lines),"
        "            element_at(_cuts, j + 1) - 1)))")
    body_words = F.expr(
        "aggregate(transform(slice(_lines, _s.start, "
        "greatest(_s.end - _s.start + 1, 0)), l -> "
        "size(filter(split(trim(l), '\\\\s+'), w -> w != ''))), "
        "0, (acc, x) -> acc + x)")
    return (
        base.withColumn("_cuts", cuts)
        .select(F.col(id_col), "_lines", F.explode(segs).alias("_s"))
        # drop an empty preamble (doc starts at a heading)
        .where(~((F.col("_s.sec_idx") == 0) & (F.col("_s.end") < 1)))
        .select(
            F.col(id_col),
            F.col("_s.sec_idx").cast("int").alias("sec_idx"),
            F.when(F.col("_s.hline") == 0, F.lit(""))
            .otherwise(F.trim(F.element_at("_lines", F.col("_s.hline"))))
            .alias("heading"),
            F.greatest(F.col("_s.end") - F.col("_s.start") + 1, F.lit(0))
            .cast("long").alias("n_lines"),
            body_words.cast("long").alias("n_words"),
        )
    )
