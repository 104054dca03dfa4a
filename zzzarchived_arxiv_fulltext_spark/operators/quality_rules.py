"""Rule-based corpus quality filters in the C4 / Gopher style.

The canonical first-pass filters of public web-scale training
pipelines (C4: Raffel et al. 2020 §2.2; Gopher: Rae et al. 2021
appendix A1.1), re-expressed as pure JVM column expressions — every
signal is a single projection that pipelines with the scan (no
shuffle, no Python), so at 100 TB these run at I/O speed and feed the
corpus-prep funnel as cheap early drops.

All signals are also DuckDB-expressible, so each operator carries a
full value-level oracle (see queries.py).
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bounded stopword probe (Gopher uses a similar tiny list: the point
# is detecting natural English prose, not language ID).
_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text_col: Column) -> Column:
    return F.filter(F.split(text_col, " "), lambda w: w != F.lit(""))


def gopher_quality_signals(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Per-document Gopher-style quality signals plus the combined
    ``passes`` verdict.

    Signals (Rae et al. 2021, A1.1):
    - word count in [min_words, max_words] (50..100000)
    - mean word length in [3, 10]
    - symbol-to-word ratio (# or ...) <= 0.1
    - < 90% of lines starting with a bullet
    - < 30% of lines ending with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct common stopwords present

    One projection, fully JVM-side; every intermediate is exposed so
    downstream policies can re-threshold without recompute.
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.round(F.aggregate(words, F.lit(0).cast("long"),
                            lambda acc, w: acc + F.length(w))
                .cast("double") / n_words, 6)).otherwise(0.0)
    n_symbols = (F.regexp_count(text, F.lit("#"))
                 + F.regexp_count(text, F.lit(r"\.\.\.")))
    symbol_ratio = F.when(
        n_words > 0, F.round(n_symbols / n_words.cast("double"), 6)
    ).otherwise(0.0)
    lines = F.filter(F.split(text, "\n"), lambda l: l != F.lit(""))
    n_lines = F.size(lines)
    bullet_frac = F.when(n_lines > 0, F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        / n_lines.cast("double"), 6)).otherwise(0.0)
    ellipsis_frac = F.when(n_lines > 0, F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / n_lines.cast("double"), 6)).otherwise(0.0)
    alpha_frac = F.when(n_words > 0, F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
        / n_words.cast("double"), 6)).otherwise(0.0)
    lowered = F.filter(F.split(F.lower(text), " "),
                       lambda w: w != F.lit(""))
    n_stop = F.size(F.array_intersect(
        F.array_distinct(lowered),
        F.array(*[F.lit(s) for s in _STOPWORDS])))

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_length"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
    )
    passes = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("mean_word_length") >= 3)
        & (F.col("mean_word_length") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stopwords") >= 2)
    )
    return out.withColumn("passes", passes)


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2): keep only lines
    that end in terminal punctuation, have >= ``min_words_per_line``
    words, and don't mention javascript; then drop documents with
    fewer than ``min_kept_lines`` surviving lines, any "lorem ipsum",
    or a curly brace.

    Line logic runs inside array expressions on the split column —
    one JVM projection + one filter, no explode, no shuffle, order
    of surviving lines preserved.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]\s*$')
        & (F.size(F.filter(F.split(l, " "), lambda w: w != F.lit("")))
           >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        (F.size(F.filter(lines, lambda l: l != F.lit("")))
         - F.size(kept)).alias("n_lines_dropped"),
    ).where(
        (F.size(kept) >= min_kept_lines)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return out


# License markers worth tagging in a pretraining corpus (Dolma-style
# taggers): detection REGEX per tag, ordered so more specific tags
# (by-sa before by) are matched independently, not first-wins.
LICENSE_PATTERNS = {
    "cc-by": r"(?i)creative\s+commons\s+attribution|CC[- ]BY(?![- ]?(SA|NC|ND))",
    "cc-by-sa": r"(?i)CC[- ]BY[- ]?SA|attribution[- ]sharealike",
    "cc-by-nc": r"(?i)CC[- ]BY[- ]?NC|attribution[- ]noncommercial",
    "cc0": r"(?i)\bCC0\b|public\s+domain\s+dedication",
    "mit": r"(?i)\bMIT\s+licen[sc]e\b",
    "apache-2": r"(?i)Apache\s+Licen[sc]e,?\s+Version\s+2|Apache-2\.0",
    "gpl": r"(?i)GNU\s+General\s+Public\s+Licen[sc]e|\bGPL[- ]?v?[23]\b",
    "all-rights-reserved": r"(?i)all\s+rights\s+reserved",
}


def license_tags(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Tag documents with the license markers their text declares —
    the provenance pass a responsible pretraining pipeline runs
    before mixing (keep permissive, route copyleft, drop
    all-rights-reserved). One pure-JVM projection: a boolean
    ``rlike`` per pattern plus a sorted comma-joined summary column
    (scalar-safe for downstream grouping).

    Returns (id, has_<tag>..., license_summary) where the summary is
    '' when nothing matched.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    flags = {tag: text.rlike(pat) for tag, pat in
             sorted(LICENSE_PATTERNS.items())}
    summary = F.concat_ws(",", *[
        F.when(flag, F.lit(tag)).otherwise(F.lit(None))
        for tag, flag in sorted(flags.items())
    ])
    out = [F.col(id_col).alias("id")]
    out += [flag.alias(f"has_{tag.replace('-', '_')}")
            for tag, flag in sorted(flags.items())]
    out.append(summary.alias("license_summary"))
    return df.select(*out)


def flag_blocklisted_terms(df: DataFrame, terms, text_col: str = "text",
                           id_col: str = "doc_id",
                           whole_words: bool = True) -> DataFrame:
    """Count blocklisted-term occurrences per document (toxicity /
    NSFW wordlist tagger). The TERM LIST is pipeline configuration
    (bounded, curated), so it compiles into ONE alternation regex —
    a single JVM ``regexp_count`` per row, not a term-table join; a
    corpus-scale blocklist belongs in ``filter_blocked_domains``-style
    suffix joins instead.

    Returns (id, n_blocklisted, blocklisted_frac) with the fraction
    over whitespace tokens; matching is case-insensitive, whole-word
    by default.
    """
    import re as _re

    terms = [t for t in terms if t]
    if not terms:
        raise ValueError("terms must be non-empty")
    alt = "|".join(sorted(_re.escape(t) for t in terms))
    pat = rf"(?i)\b(?:{alt})\b" if whole_words else rf"(?i)(?:{alt})"
    text = F.coalesce(F.col(text_col), F.lit(""))
    n = F.regexp_count(text, F.lit(pat))
    n_tokens = F.size(F.split(text, " "))
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_blocklisted"),
        F.round(n / n_tokens, 6).alias("blocklisted_frac"),
    )
