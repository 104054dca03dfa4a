"""PII redaction for training corpora.

Emails, URLs, phone numbers and IPv4 addresses are replaced with
typed placeholder tokens, and per-type match counts are emitted for
corpus auditing. Patterns are deliberately RE2-compatible (no
lookaround, no backreferences) so the exact same regexes run in
Spark's Java engine, DuckDB's RE2 oracle, and any downstream engine —
redaction must be reproducible wherever the corpus is reprocessed.

Everything is a single JVM projection (regexp_replace /
regexp_extract_all): no Python, no shuffle; Catalyst pipelines it
with the scan, so at 100 TB redaction is free riding on whatever pass
already reads the text.
"""

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters: URLs before emails so
# credentials-in-URL don't leave a partial match behind, and IPv4
# before phones so a dotted quad is never half-eaten as a phone.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # before phone on principle, though phone needs separators IBANs
    # never carry; \b and the char classes mean the same thing in
    # Java regex (Spark) and RE2 (the DuckDB oracle)
    ("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    ("phone",
     r"(\+?\d{1,3}[-. (]{1,2})?\d{3}[-. )]{1,2}\d{3}[-. ]?\d{2,4}",
     "<PHONE>"),
]


def redact_text(text: Column) -> Column:
    """The redacted text column (patterns applied in order)."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, redacted, n_url, n_email, n_ipv4, n_iban, n_phone).

    Counts are measured sequentially on the progressively redacted
    text, so e.g. emails inside already-redacted URLs are not
    double-counted — each count reflects what that pattern's
    replacement pass actually did.
    """
    text = F.col(text_col)
    counts = []
    remaining = text
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(remaining, F.lit(pattern), 0))
            .alias(f"n_{name}")
        )
        remaining = F.regexp_replace(remaining, pattern, repl)
    return df.select(
        F.col(id_col),
        redact_text(text).alias("redacted"),
        *counts,
    )


def segment_tokens(
    df: DataFrame,
    max_tokens: int = 48,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window segmentation: (id, seg_id, seg_text) rows.

    Each document's whitespace tokens become overlapping windows of
    ``max_tokens`` starting every ``stride`` tokens — the standard
    pretraining/embedding chunking. Pure JVM (split → sequence →
    slice → posexplode); a 10^12-document corpus segments in the same
    single map pass that reads it.
    """
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("stride and max_tokens must be positive")
    # alias-projected split (see dedup.word_shingles: a split inlined
    # into the transform lambda re-splits the text per segment)
    words = F.col("_words")
    n_segs = F.greatest(
        F.ceil((F.size(words) - F.lit(max_tokens)) / F.lit(stride))
        .cast("int") + 1,
        F.lit(1),
    )
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda k: F.array_join(
            F.slice(words, k * stride + 1, max_tokens), " "
        ),
    )
    return df.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_words"),
    ).select(
        F.col(id_col),
        F.posexplode(segs).alias("seg_id", "seg_text"),
    )
