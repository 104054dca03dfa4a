"""Corpus retrieval operators: inverted index construction and BM25
ranked search.

Data-curation pipelines need retrieval over the corpus itself —
mining documents that match an evaluation query (contamination
review), pulling topical slices for mixture construction, or
auditing dedup candidates. Both operators are pure DataFrame
programs:

- the inverted index is explode → distinct → per-term rank window →
  bounded posting aggregation (the cap keeps stopword postings from
  concentrating a term's whole corpus row set in one task);
- BM25 filters the exploded words to the QUERY terms first (a
  bounded literal set, so the filter pushes into the scan side of
  every downstream agg), computes tf/dl/idf with two scalar
  aggregates (N, avgdl — bounded driver metadata), and takes the
  final top-k with per-partition heaps (TakeOrderedAndProject).
"""

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_postings: int = 1000) -> DataFrame:
    """(term, n_docs, postings): sorted doc-id posting list per term,
    truncated at ``max_postings`` ids (the true document frequency is
    always ``n_docs``, so truncation is visible, never silent).

    The rank window runs per term BEFORE any collect, so no task ever
    materializes more than ``max_postings`` ids for a hot term.
    """
    base = _doc_terms(df, text_col, id_col).distinct()
    w = Window.partitionBy("term").orderBy("id")
    ranked = base.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.concat_ws(",", F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("_rn") <= max_postings, F.col("id")))),
                lambda x: x.cast("string"))).alias("postings"),
        )
    )


def bm25_search(df: DataFrame, query_terms: Sequence[str], k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by BM25
    (Robertson idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    One corpus pass builds per-doc lengths (map-side combinable); the
    term-frequency side filters the explode to the bounded query-term
    set immediately, so only matching (doc, term) pairs ever shuffle.
    N and avgdl are two scalar aggregates (bounded driver metadata);
    the result is a per-partition-heap top-k, never a global sort.
    """
    terms: List[str] = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    words = _doc_terms(df, text_col, id_col)
    dl = words.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"),
                   F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = stats["n"], stats["avgdl"]
    if not n_docs:
        # empty-corpus result must keep the REAL id type (string doc
        # ids from pdf_to_spans, not just long) or downstream
        # unions/joins break on schema
        from pyspark.sql.types import DoubleType, StructField, StructType

        return df.sparkSession.createDataFrame(
            [], StructType([
                StructField(id_col, df.schema[id_col].dataType),
                StructField("score", DoubleType()),
            ]))

    tf = (
        words.where(F.col("term").isin(terms))
        .groupBy("id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    per_term = (
        tf.join(dfreq, on="term")
        .join(dl, on="id")
        .select(
            "id",
            (idf * F.col("tf") * (k1 + 1.0)
             / (F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))))
            .alias("s"),
        )
    )
    return (
        per_term.groupBy("id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
        .select(F.col("id").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
