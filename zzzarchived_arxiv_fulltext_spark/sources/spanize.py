"""Span-ize the driver's flat ``documents`` table.

The driver testdata carries a flat text corpus
(``documents(doc_id, text, lang, source, n_chars)``). For queries that
exercise the interleaved-span surface against a DuckDB oracle, we
derive a deterministic span table from it with pure SQL expressions —
so the identical derivation can run on both engines.

Each document becomes: [stamp text span] + N word-chunk text spans +
an interleaved media span, with offsets reversed in array order so
downstream operators must sort by offset (I3) rather than trust
arrival order.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_WORDS = 12  # words per text span


def spanized_documents(docs: DataFrame) -> DataFrame:
    """documents → (doc_id:string, spans:array<struct<...>>).

    Built from JVM-side expressions only (split/transform/struct) —
    no UDF, fully Catalyst-visible, and mirrored 1:1 by DuckDB SQL in
    the oracle harness.
    """
    # alias-projected split (see dedup.word_shingles: a split inlined
    # into the transform lambda re-splits the text once per chunk —
    # O(words²·len/12) per row on giant documents)
    words = F.col("_words")
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(CHUNK_WORDS)).cast("int"), F.lit(1)
    )

    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            F.lit("text").alias("kind"),
            F.array_join(
                F.slice(words, k * CHUNK_WORDS + 1, CHUNK_WORDS), " "
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            k.cast("int").alias("offset"),
        ),
    )
    media = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("img://"), F.col("doc_id").cast("string")
                     ).alias("media_ref"),
            n_chunks.alias("offset"),
        )
    )
    # reverse() scrambles arrival order vs offset order on purpose
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(F.col("text"), " ").alias("_words"),
    ).select(
        "doc_id",
        F.reverse(F.concat(chunk, media)).alias("spans"),
    )
