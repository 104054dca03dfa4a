"""Driver-contract query battery: Spark queries + DuckDB oracle SQL.

Every natively-expressible operator from SURVEY.md §2 (and the
training-data ops battery) is registered here twice: as a PySpark
DataFrame program and as ANSI SQL the driver runs on DuckDB over the
same parquet. Column names/values must match exactly (the driver
sorts columns by name and value-hashes).

Keep each Spark query Catalyst-friendly: JVM expressions wherever the
semantics allow. Queries that deliberately route through the REAL
Arrow-batched UDF stages (``psv_normalize_udf``, the span-extraction
pair, ``media_feature_extraction``, ``winnowing_fingerprint_overlap``,
``pdf_text_extraction``, ``html_main_content``, ``corpus_prep_funnel``)
are oracle-checked against closed-form SQL twins — the strongest
correctness evidence the harness can record for the UDF path.
"""

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, QueryFn] = {}
ORACLES: Dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# Q1 — extraction quality statistic (reference fulltext.py:27-44)
# --------------------------------------------------------------------------

_JUNK_RE = r"(\(cid:\d+\)|lllll|\.\.\.\.\.|\*\*\*\*\*)"


@_register(
    "avg_word_length",
    f"""
    SELECT doc_id,
           round(length(s)
                 / (len(list_filter(regexp_split_to_array(trim(s), '\\s+'),
                                    x -> x <> '')) + 1), 6) AS awl
    FROM (SELECT doc_id, regexp_replace(text, '{_JUNK_RE}', '', 'g') AS s
          FROM documents)
    ORDER BY doc_id
    """,
)
def q_avg_word_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python str.split() yields [] on blank text; filtering empties
    # from the regex split matches that (reference quality gate).
    s = F.regexp_replace(F.col("text"), _JUNK_RE, "")
    n_words = F.size(
        F.filter(F.split(F.trim(s), r"\s+"), lambda x: x != F.lit(""))
    )
    awl = F.length(s) / (n_words + 1)
    return _docs(spark, sf_dir).select(
        "doc_id", F.round(awl, 6).alias("awl")
    )


# --------------------------------------------------------------------------
# V8 — abbreviation expansion (reference psv.py:151-167)
# --------------------------------------------------------------------------

_EXPANSIONS = (
    (r"(?i)Fig[s]?[\.]?\s", "Figure "),
    (r"(?i)Eq[s]?[\.]?\s", "Equation "),
    (r"(?i)Sect[s]?[\.]?\s", "Section "),
    (r"(?i)Ref[s]?[\.]?\s", "Reference "),
    (r"(?i)Prof\.", "Prof"),
    (r"(?i)Dr\.", "Dr"),
)


def _expand_sql(col: str) -> str:
    expr = col
    for pat, repl in _EXPANSIONS:
        # DuckDB takes flags as a 4th arg instead of inline (?i)
        expr = f"regexp_replace({expr}, '{pat[4:]}', '{repl}', 'gi')"
    return expr


@_register(
    "expand_abbreviations",
    f"""
    SELECT doc_id, {_expand_sql("('Fig. 1 shows Eqs. 2 near Sect. 3 by Prof. X Dr. Y Refs. 4: ' || substr(text, 1, 80))")} AS expanded
    FROM documents ORDER BY doc_id
    """,
)
def q_expand_abbreviations(spark: SparkSession, sf_dir: str) -> DataFrame:
    col = F.concat(
        F.lit("Fig. 1 shows Eqs. 2 near Sect. 3 by Prof. X Dr. Y Refs. 4: "),
        F.substring(F.col("text"), 1, 80),
    )
    for pat, repl in _EXPANSIONS:
        col = F.regexp_replace(col, pat, repl)
    return _docs(spark, sf_dir).select("doc_id", col.alias("expanded"))


# --------------------------------------------------------------------------
# V9+V10 — symbol/digit scrub (reference psv.py:170-181)
# --------------------------------------------------------------------------


@_register(
    "scrub_symbols_numbers",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[^\.\w ]', ' ', 'g'),
                 '\_', ' ', 'g'),
               '\d+[\.]?\d+/', ' ', 'g'),
             '\d', ' ', 'g') AS scrubbed
    FROM documents ORDER BY doc_id
    """,
)
def q_scrub_symbols_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    col = F.col("text")
    for pat in (r"[^\.\w ]", r"\_", r"\d+[\.]?\d+/", r"\d"):
        col = F.regexp_replace(col, pat, " ")
    return _docs(spark, sf_dir).select("doc_id", col.alias("scrubbed"))


# --------------------------------------------------------------------------
# V12+V13 — single-letter removal (doubled) + space collapse
# (reference psv.py:196-208)
# --------------------------------------------------------------------------


@_register(
    "single_alpha_spaces",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '\s[a-zA-Z]\s', ' ', 'g'),
                   '\s[a-zA-Z]\s', ' ', 'g'),
                 '\s[a-zA-Z]\.', '.', 'g'),
               '\s+', ' ', 'g'),
             '^\s+', '', 'g') AS cleaned
    FROM documents ORDER BY doc_id
    """,
)
def q_single_alpha_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    col = F.col("text")
    for pat, rep in ((r"\s[a-zA-Z]\s", " "), (r"\s[a-zA-Z]\s", " "),
                     (r"\s[a-zA-Z]\.", "."), (r"\s+", " "), (r"^\s+", "")):
        col = F.regexp_replace(col, pat, rep)
    return _docs(spark, sf_dir).select("doc_id", col.alias("cleaned"))


# --------------------------------------------------------------------------
# V15 — sentence cleaning filter (reference psv.py:219-240)
# --------------------------------------------------------------------------


@_register(
    "clean_sentences",
    r"""
    SELECT doc_id, lower(s) AS sentence
    FROM (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(text, '\W', ' ', 'g'),
                                 '\s+', ' ', 'g')) AS s
      FROM documents
      WHERE regexp_matches(substr(text, 1, 1), '\w')
    )
    WHERE length(s) > 3
    ORDER BY doc_id
    """,
)
def q_clean_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"\W", " "), r"\s+", " "
        )
    )
    return (
        _docs(spark, sf_dir)
        .where(F.substring("text", 1, 1).rlike(r"\w"))
        .select("doc_id", F.lower(s).alias("sentence"))
        .where(F.length("sentence") > 3)
    )


# --------------------------------------------------------------------------
# J1 — work dedup via left-anti join (reference controllers.py:140-158)
# --------------------------------------------------------------------------


@_register(
    "pending_after_anti_join",
    """
    SELECT d.doc_id, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents done
      WHERE done.doc_id % 10 < 3 AND done.doc_id = d.doc_id
    )
    ORDER BY d.doc_id
    """,
)
def q_pending_after_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    done = docs.where(F.col("doc_id") % 10 < 3).select("doc_id")
    return docs.join(done, on="doc_id", how="left_anti").select(
        "doc_id", "n_chars"
    )


# --------------------------------------------------------------------------
# J3 — latest-version resolution via window (reference store.py:145-165)
# --------------------------------------------------------------------------


@_register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
        )
    )


# --------------------------------------------------------------------------
# I1/I3/I4 — span explode / stable reassembly. The documents table is
# span-ized with pure SQL expressions (sources/spanize.py), spans are
# deliberately stored in reverse order, and the query must rebuild the
# original text by sorting on offset — proving order never depends on
# arrival/shuffle order. The oracle is the identity (rebuilt == text).
# --------------------------------------------------------------------------


@_register(
    "span_reassembly",
    """
    SELECT doc_id::VARCHAR AS doc_id, text AS rebuilt
    FROM documents ORDER BY doc_id
    """,
)
def q_span_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.spanize import spanized_documents

    spans = spanized_documents(_docs(spark, sf_dir))
    text_spans = F.expr(
        "array_sort(filter(spans, s -> s.kind = 'text'),"
        " (a, b) -> a.offset - b.offset)"
    )
    rebuilt = F.array_join(
        F.transform(text_spans, lambda s: s["text"]), " "
    )
    return spans.select("doc_id", rebuilt.alias("rebuilt"))


# --------------------------------------------------------------------------
# Training-data ops: token counting / quality scoring / fingerprinting
# --------------------------------------------------------------------------


@_register(
    "token_count",
    """
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n_tokens")
    )


_STOPWORDS = "('the', 'a', 'of', 'in', 'and', 'to')"


@_register(
    "quality_score",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           len(string_split(text, ' ')) AS n_tokens,
           round(length(text) / len(string_split(text, ' ')), 6)
             AS avg_token_len,
           round(len(list_filter(string_split(text, ' '),
                                 w -> w IN {_STOPWORDS}))
                 / len(string_split(text, ' ')), 6) AS stopword_ratio
    FROM documents ORDER BY doc_id
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ", -1)
    stop = F.size(
        F.filter(
            toks,
            lambda w: w.isin("the", "a", "of", "in", "and", "to"),
        )
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.round(F.length("text") / F.size(toks), 6).alias("avg_token_len"),
        F.round(stop / F.size(toks), 6).alias("stopword_ratio"),
    )


@_register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(text, '[^0-9A-Za-z_]', '', 'g')))
             AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(
            F.lower(F.regexp_replace("text", "[^0-9A-Za-z_]", ""))
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Exact deduplication: hash-groupBy on content (map-side combinable)
# --------------------------------------------------------------------------


@_register(
    "exact_dedup_groups",
    """
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS representative
    FROM documents
    GROUP BY md5(text)
    ORDER BY content_hash
    """,
)
def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("representative"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation / windowed-time analytics over the events stream table
# --------------------------------------------------------------------------


@_register(
    "event_hourly_rollup",
    """
    SELECT user_id,
           epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
           count(*) AS n_events,
           sum(value)::DOUBLE AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY user_id, hour_epoch
    """,
)
def q_event_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(
            "user_id",
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Relational coverage: scan→agg (TPC-H Q1 shape) and multi-join rollup,
# exercising partial aggregation and broadcast joins at scale.
# --------------------------------------------------------------------------


@_register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)::BIGINT AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
           (sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))))::DOUBLE AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           (sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))))::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# The PSV pandas UDF, oracle-checked: the Spark side runs the REAL
# Arrow-batched UDF (functions.psv.normalize_text_psv); the oracle is
# the equivalent native SQL chain, valid for this corpus because
# documents.text is single-line ASCII (verified: no CR/LF/tab/dots).
# This is the strongest per-round correctness evidence the harness can
# record for the UDF path.
# --------------------------------------------------------------------------

_EXPAND_STEPS_SQL = (
    (r"Fig[s]?[\.]?\s", "Figure "),
    (r"Eq[s]?[\.]?\s", "Equation "),
    (r"Sect[s]?[\.]?\s", "Section "),
    (r"Ref[s]?[\.]?\s", "Reference "),
    (r"Prof\.", "Prof"),
    (r"Dr\.", "Dr"),
)

_SCRUB_STEPS_SQL = (
    (r"[^\.\w ]", " "),
    (r"\_", " "),
    (r"\d+[\.]?\d+/", " "),
    (r"\d", " "),
    (r"\s\w\.\w\.\w\.\s", " "),
    (r"\s\w\.\w\.\s", " "),
    (r"\s\w\.\s", " "),
    (r"\s[a-zA-Z]\s", " "),
    (r"\s[a-zA-Z]\s", " "),
    (r"\s[a-zA-Z]\.", "."),
    (r"\s+", " "),
    (r"^\s+", ""),
)


def _scrub_sql(expr: str) -> str:
    """SQL twin of one tidy line: first-repair hyphen strip, expand,
    scalar scrub chain, second-repair hyphen strip."""
    expr = f"regexp_replace({expr}, '- $', '', 'g')"
    for pat, repl in _EXPAND_STEPS_SQL:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'gi')"
    for pat, repl in _SCRUB_STEPS_SQL:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"regexp_replace({expr}, '- $', '', 'g')"


def _clean_sql(expr: str) -> str:
    """SQL twin of _clean_sentence: must start with \\w; \\W -> ' ';
    collapse; strip; drop <=3 chars; lowercase."""
    cleaned = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '\\W', ' ', 'g'), '\\s+', ' ', 'g'), '^\\s+', '', 'g'),"
        f" '\\s+$', '', 'g')"
    )
    return (
        f"CASE WHEN NOT regexp_matches({expr}, '^\\w') THEN ''"
        f" WHEN length({cleaned}) <= 3 THEN ''"
        f" ELSE lower({cleaned}) END"
    )


def _psv_chain_sql() -> str:
    return _clean_sql(_scrub_sql("text || ' '"))


@_register(
    "psv_normalize_udf",
    f"SELECT doc_id, {_psv_chain_sql()} AS psv FROM documents ORDER BY doc_id",
)
def q_psv_normalize_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .functions.psv import normalize_text_psv

    @pandas_udf("string")
    def psv_udf(texts: pd.Series) -> pd.Series:
        return texts.map(normalize_text_psv)

    return _docs(spark, sf_dir).select("doc_id", psv_udf("text").alias("psv"))


# --------------------------------------------------------------------------
# Multi-line PSV pathology: non-vacuous oracle coverage for the
# STATEFUL text passes (V4 split_on_references incl. the last-heading
# rule and the 50% guard, V5 boilerplate strip incl. the prev-line
# affiliation rule, V7 hyphenation/EOL repair). The driver corpus is
# single-line ASCII, so these passes are no-ops in psv_normalize_udf;
# here each document is wrapped in one of three planted multi-line
# scaffolds whose stateful-pass result is CLOSED FORM (validated
# against the reference semantics, fulltext/process/psv.py:111-148,
# 243-282), reducing the oracle to the already-twinned scalar chain.
# If any of V4/V5/V7 breaks, the expected string changes.
# --------------------------------------------------------------------------

# scaffold A (doc_id%3==0): arXiv stamp dropped, digits+University
# affiliation pair dropped, hyphen + lowercase-continuation rejoin,
# late References heading split off (refs fraction under the guard)
_SCAFFOLD_A = ["arXiv:1701.0001 22 Jan 2017",
               "The measured effect was obtai-",
               "ned without interruption",
               "98765",
               "University of Testing",
               None,  # the document's own text
               "References",
               "[1] junk citation 2001",
               "[2] more junk 1999"]
# scaffold B (%3==1): heading on line 1 of 3 — the refs block would be
# >50% of the doc, so the guard keeps everything (heading included)
_SCAFFOLD_B = ["References", "The guard keeps everything intact", None]
# scaffold C (%3==2): TWO headings — the split must take the LAST one
_SCAFFOLD_C = ["References", "The last heading wins here", None,
               "Bibliography", "[1] junk"]


def _psv_multiline_oracle() -> str:
    exp_a = _clean_sql(
        "'The measured effect was obtained without interruption ' || "
        + _scrub_sql("'98765 ' || text || ' '"))
    exp_b = ("'references' || ' ' || " + _clean_sql(_scrub_sql(
        "'The guard keeps everything intact ' || text || ' '")))
    exp_c = ("'references' || ' ' || " + _clean_sql(_scrub_sql(
        "'The last heading wins here ' || text || ' '")))
    return f"""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN {exp_a}
             WHEN 1 THEN {exp_b}
             ELSE {exp_c}
           END AS psv
    FROM documents ORDER BY doc_id
    """


@_register("psv_multiline_pathology", _psv_multiline_oracle())
def q_psv_multiline_pathology(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .functions.psv import normalize_text_psv

    @pandas_udf("string")
    def psv_udf(texts: pd.Series) -> pd.Series:
        return texts.map(normalize_text_psv)

    def scaffold(pieces) -> F.Column:
        return F.concat_ws(
            "\n", *[F.col("text") if p is None else F.lit(p)
                    for p in pieces])

    wrapped = (
        F.when(F.col("doc_id") % 3 == 0, scaffold(_SCAFFOLD_A))
        .when(F.col("doc_id") % 3 == 1, scaffold(_SCAFFOLD_B))
        .otherwise(scaffold(_SCAFFOLD_C))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", psv_udf(wrapped).alias("psv"))


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, restricted id range)
# --------------------------------------------------------------------------

def _pair_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    base = docs.where(F.col("doc_id") < 40)
    planted = docs.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return base.unionByName(planted)


# the corpus for pair queries: documents 0-39 plus planted copies
# (id+10000) so near-dup detection has guaranteed positives
_PAIR_CORPUS_SQL = """
      SELECT doc_id, text FROM documents WHERE doc_id < 40
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 8
"""

_SHINGLE_SQL = """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM (""" + _PAIR_CORPUS_SQL + """)
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, UNNEST(range(1, greatest(len(ws) - 1, 2))) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""


@_register(
    "ngram_jaccard_pairs",
    _SHINGLE_SQL + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(count(*) / (sa.n + sb.n - count(*)), 6) AS jaccard
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    JOIN sizes sa ON sa.doc_id = a.doc_id
    JOIN sizes sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
    ORDER BY id_a, id_b
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_jaccard, word_shingles

    docs = _pair_corpus(spark, sf_dir)
    sh = word_shingles(docs, n=3)
    all_pairs = (
        sh.alias("a").join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return exact_jaccard(sh, all_pairs).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# MinHash LSH candidate pairs (engine-portable hash family)
# --------------------------------------------------------------------------

_MH_HASHES = 8
_MH_BANDS = 4


def _minhash_sql() -> str:
    mins = ", ".join(
        f"min(md5('{s}|' || shingle)) AS h{s}" for s in range(_MH_HASHES)
    )
    rows_per_band = _MH_HASHES // _MH_BANDS
    band_rows = []
    for b in range(_MH_BANDS):
        cols = " || '|' || ".join(
            f"h{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_rows.append(f"SELECT id, {b} AS band, md5({cols}) AS bucket FROM sig")
    buckets = " UNION ALL ".join(band_rows)
    return _SHINGLE_SQL + f""",
    sig AS (SELECT doc_id AS id, {mins} FROM sh GROUP BY doc_id),
    buckets AS ({buckets})
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ORDER BY id_a, id_b
    """


@_register("minhash_lsh_pairs", _minhash_sql())
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures, word_shingles

    docs = _pair_corpus(spark, sf_dir)
    sigs = minhash_signatures(word_shingles(docs, n=3), num_hashes=_MH_HASHES)
    return lsh_candidate_pairs(
        sigs, bands=_MH_BANDS, rows_per_band=_MH_HASHES // _MH_BANDS
    )


# --------------------------------------------------------------------------
# SimHash (16-bit, engine-portable md5 bit extraction)
# --------------------------------------------------------------------------


def _simhash_sql(bits: int = 16) -> str:
    sums = ", ".join(
        "sum(2 * ((strpos('0123456789abcdef', substr(md5(w), "
        f"{b // 4 + 1}, 1)) - 1 >> {3 - b % 4}) & 1) - 1) AS s{b}"
        for b in range(bits)
    )
    value = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    sums AS (SELECT id, {sums} FROM toks GROUP BY id)
    SELECT id, CAST({value} AS BIGINT) AS simhash FROM sums ORDER BY id
    """


@_register("simhash_16", _simhash_sql())
def q_simhash_16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=16)


# --------------------------------------------------------------------------
# Brute-force cosine top-k over embeddings
# --------------------------------------------------------------------------


@_register(
    "cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT qid, nid,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS cos
      FROM q, c WHERE qid <> nid
    ),
    ranked AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, nid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, nid AS neighbor_id, cos, rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb, emb.where("vec_id < 3"), k=5)


@_register(
    "embedding_quantization",
    """
    WITH d AS (
      SELECT vec_id, i, embedding[i]::DOUBLE AS v
      FROM embeddings, UNNEST(range(1, 65)) AS t(i)
    ),
    s AS (
      SELECT i, greatest(max(abs(v)), 1e-12) / 127.0 AS scale
      FROM d GROUP BY i
    ),
    q AS (
      SELECT vec_id, v, scale,
             greatest(least(round(v / scale, 0), 127.0), -127.0) AS qv
      FROM d JOIN s USING (i)
    )
    SELECT vec_id, max(abs(qv))::INT AS max_abs_q,
           round(sqrt(sum((v - qv * scale) * (v - qv * scale)) / 64), 9)
             AS rmse
    FROM q GROUP BY vec_id ORDER BY vec_id
    """,
)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus (4x ANN memory shrink) with per-vector reconstruction
    RMSE; the oracle replays scale fitting + clamped rounding in SQL.
    Driver output is the scalar-safe summary (arrays stay internal)."""
    from .operators.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.array_max(F.transform("qvec", lambda x: F.abs(x)))
        .alias("max_abs_q"),
        "rmse",
    ).orderBy("vec_id")


@_register(
    "bpe_merge_training",
    """
    WITH m AS (SELECT sum(doc_id % 3 + 2)::BIGINT AS c FROM documents)
    SELECT v.rnd::INT AS round, v.l AS "left", v.r AS "right",
           (SELECT c FROM m) AS pair_count
    FROM (VALUES (1, 'p', 'q'), (2, 'pq', 'r'), (3, 'pqr', 's'))
         AS v(rnd, l, r)
    ORDER BY round
    """,
)
def q_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge training on a planted closed form: every
    doc is 'p q r s' repeated (doc_id % 3 + 2) times, so the learned
    merges are provably (p,q) then (pq,r) then (pqr,s), each with
    pair count = sum over docs of the repeat factor, with the
    lexicographic tie-break exercised in every round."""
    from .operators.corpus_stats import bpe_train_merges

    reps = (F.col("doc_id") % 3 + 2).cast("int")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(F.array_repeat(F.lit("p q r s"), reps), " ")
        .alias("text"))
    return bpe_train_merges(docs, n_merges=3)


@_register(
    "script_profile_triage",
    r"""
    WITH d AS (
      SELECT doc_id,
             text || repeat('ж', doc_id % 4) || repeat('中', doc_id % 3)
               AS text
      FROM documents
    ),
    c AS (
      SELECT doc_id, length(text) AS n_chars,
        length(regexp_extract_all(text, '\p{Latin}'))::INT AS n_latin,
        length(regexp_extract_all(text, '\p{Cyrillic}'))::INT AS n_cyrillic,
        length(regexp_extract_all(text, '\p{Han}'))::INT AS n_han,
        length(regexp_extract_all(text, '\p{Arabic}'))::INT AS n_arabic,
        length(regexp_extract_all(text, '\p{Devanagari}'))::INT
          AS n_devanagari,
        length(regexp_extract_all(text, '\p{Greek}'))::INT AS n_greek,
        length(regexp_extract_all(text, '\p{Hangul}'))::INT AS n_hangul,
        length(regexp_extract_all(text, '\p{Hiragana}'))::INT AS n_hiragana,
        length(regexp_extract_all(text, '\p{Katakana}'))::INT AS n_katakana
      FROM d
    )
    SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic, n_devanagari,
           n_greek, n_hangul, n_hiragana, n_katakana,
           (n_chars - (n_latin + n_cyrillic + n_han + n_arabic
                       + n_devanagari + n_greek + n_hangul + n_hiragana
                       + n_katakana))::INT AS n_other,
           CASE
             WHEN greatest(n_latin, n_cyrillic, n_han, n_arabic,
                           n_devanagari, n_greek, n_hangul, n_hiragana,
                           n_katakana) = 0 THEN 'none'
             WHEN n_arabic = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'arabic'
             WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'cyrillic'
             WHEN n_devanagari = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'devanagari'
             WHEN n_greek = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'greek'
             WHEN n_han = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'han'
             WHEN n_hangul = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'hangul'
             WHEN n_hiragana = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'hiragana'
             WHEN n_katakana = greatest(n_latin, n_cyrillic, n_han,
                  n_arabic, n_devanagari, n_greek, n_hangul,
                  n_hiragana, n_katakana) THEN 'katakana'
             ELSE 'latin'
           END AS dominant_script
    FROM c ORDER BY doc_id
    """,
)
def q_script_profile_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode writing-system composition with planted Cyrillic/Han
    suffixes (doc_id % 4 / % 3 chars) so non-Latin counts are
    exercised; the oracle replays the per-script regexp counts and
    the lexicographic-smallest dominant-script tie-break in RE2."""
    from .operators.text_metrics import script_profile

    planted = F.concat(
        F.col("text"),
        F.repeat(F.lit("ж"), (F.col("doc_id") % 4).cast("int")),
        F.repeat(F.lit("中"), (F.col("doc_id") % 3).cast("int")))
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return (script_profile(docs)
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


@_register(
    "license_detection",
    """
    SELECT doc_id,
      (doc_id % 9 = 7) AS has_all_rights_reserved,
      (doc_id % 9 = 5) AS has_apache_2,
      (doc_id % 9 = 0) AS has_cc_by,
      (doc_id % 9 = 2) AS has_cc_by_nc,
      (doc_id % 9 = 1) AS has_cc_by_sa,
      (doc_id % 9 = 3) AS has_cc0,
      (doc_id % 9 = 6) AS has_gpl,
      (doc_id % 9 = 4) AS has_mit,
      CASE doc_id % 9
        WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-sa'
        WHEN 2 THEN 'cc-by-nc' WHEN 3 THEN 'cc0' WHEN 4 THEN 'mit'
        WHEN 5 THEN 'apache-2' WHEN 6 THEN 'gpl'
        WHEN 7 THEN 'all-rights-reserved' ELSE '' END
        AS license_summary
    FROM documents ORDER BY doc_id
    """,
)
def q_license_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License/provenance tagging on planted declarations — each
    doc_id % 9 class carries exactly one marker phrase (including the
    CC-BY-SA / CC-BY-NC phrases that must NOT also tag as plain
    CC-BY), class 8 none; the oracle is the closed form."""
    from .operators.quality_rules import license_tags

    k = F.col("doc_id") % 9
    planted = (
        F.when(k == 0, F.lit("Licensed under Creative Commons Attribution 4.0"))
        .when(k == 1, F.lit("CC-BY-SA 3.0 applies to this work"))
        .when(k == 2, F.lit("Shared under CC BY-NC terms"))
        .when(k == 3, F.lit("Released as CC0 public domain dedication"))
        .when(k == 4, F.lit("Distributed under the MIT license"))
        .when(k == 5, F.lit("Apache License, Version 2.0"))
        .when(k == 6, F.lit("GNU General Public License v3"))
        .when(k == 7, F.lit("Copyright 2020. All rights reserved."))
        .otherwise(F.lit("no marker text in this document")))
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return (license_tags(docs)
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


@_register(
    "blocklisted_term_tagging",
    """
    SELECT doc_id,
      (doc_id % 3)::INT AS n_blocklisted,
      round((doc_id % 3) / (4.0 + (doc_id % 3)), 6) AS blocklisted_frac
    FROM documents ORDER BY doc_id
    """,
)
def q_blocklisted_term_tagging(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Wordlist tagger on planted terms: doc_id % 3 whole-word hits
    per doc plus one 'badwording' decoy that the word boundary must
    NOT count; closed-form oracle."""
    from .operators.quality_rules import flag_blocklisted_terms

    k = (F.col("doc_id") % 3).cast("int")
    planted = F.concat(
        F.lit("clean text here"),
        F.repeat(F.lit(" badword"), k),
        F.lit(" badwording"))
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return (flag_blocklisted_terms(docs, ["badword", "otherbad"])
            .withColumnRenamed("id", "doc_id")
            .withColumn("n_blocklisted", F.col("n_blocklisted").cast("int"))
            .orderBy("doc_id"))


@_register(
    "corpus_datasheet",
    """
    WITH t AS (
      SELECT len(string_split(text, ' ')) AS nt, length(text) AS nc,
             lang, source
      FROM documents
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, count(*)::DOUBLE AS value FROM t
      UNION ALL SELECT 'n_tokens', sum(nt)::DOUBLE FROM t
      UNION ALL SELECT 'mean_tokens', round(avg(nt), 6) FROM t
      UNION ALL SELECT 'max_tokens', max(nt)::DOUBLE FROM t
      UNION ALL SELECT 'mean_chars', round(avg(nc), 6) FROM t
      UNION ALL SELECT 'n_langs', count(DISTINCT lang)::DOUBLE FROM t
      UNION ALL SELECT 'n_sources', count(DISTINCT source)::DOUBLE FROM t
      UNION ALL
      SELECT 'lang_share:' || lang,
             round(count(*) / (SELECT count(*) FROM t), 6)
      FROM t GROUP BY lang
    ) ORDER BY metric
    """,
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary in long (metric, value) format — size,
    token/length profile, language composition — two bounded
    aggregations, schema stable as languages come and go."""
    from .operators.corpus_stats import corpus_report

    return corpus_report(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# Language ID + token stats (training-data text analysis)
# --------------------------------------------------------------------------


def _lang_sql() -> str:
    from .operators.text_metrics import _LANG_MARKERS

    selects = []
    for lang, markers in _LANG_MARKERS.items():
        terms = " + ".join(
            f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}.0"
            for m in markers
        )
        selects.append(f"SELECT doc_id, '{lang}' AS lang, ({terms}) AS score "
                       "FROM padded")
    union = " UNION ALL ".join(selects)
    return f"""
    WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p
                    FROM documents),
    scores AS ({union}),
    ranked AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang DESC) AS rn
      FROM scores
    )
    SELECT doc_id, lang AS predicted_lang, round(score, 6) AS lang_score
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """


@_register("language_id", _lang_sql())
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_metrics import language_id

    return language_id(_docs(spark, sf_dir))


@_register(
    "token_stats",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             AS bpe_tokens,
           length(text) AS n_chars
    FROM documents ORDER BY doc_id
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_metrics import token_stats

    return token_stats(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# ANN oracles via planted exact duplicates: three copies of each query
# vector are planted into the corpus (ids +900000/+910000/+920000).
# Identical vectors land in identical LSH buckets / IVF clusters
# deterministically, so the approximate top-3 EQUALS the brute-force
# top-3 (three cos=1.0 rows, tie-broken by id) — which IS expressible
# in DuckDB. This turns the whole ANN machinery (bucketing, candidate
# joins, scoring, window top-k) into a hash-checkable query.
# --------------------------------------------------------------------------

_ANN_PLANT_OFFSETS = (900000, 910000, 920000)

_ANN_CORPUS_SQL = """
      SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings
""" + " ".join(
    f"""UNION ALL
      SELECT vec_id + {off} AS nid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 5
    """ for off in _ANN_PLANT_OFFSETS
)

_ANN_TOPK_ORACLE = f"""
    WITH corpus AS ({_ANN_CORPUS_SQL}),
    q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT qid, nid,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS cos
      FROM q, corpus WHERE qid <> nid
    ),
    ranked AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, nid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, nid AS neighbor_id, cos, rank
    FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
    """


def _planted_ann_inputs(spark: SparkSession, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select("vec_id", "embedding")
    queries = emb.where("vec_id < 5").select("vec_id", "embedding")
    for off in _ANN_PLANT_OFFSETS:
        corpus = corpus.unionByName(
            queries.select((F.col("vec_id") + off).alias("vec_id"),
                           "embedding")
        )
    return corpus, queries


@_register("ann_topk_lsh", _ANN_TOPK_ORACLE)
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ann_topk

    corpus, queries = _planted_ann_inputs(spark, sf_dir)
    return ann_topk(corpus, queries, k=3, dim=64, tables=16, planes=4)


# Winnowing (k=8 char-grams, window=16, md5 hash family): the k-gram
# hash is the top 60 bits of md5, so the whole scheme — hashes, window
# minima, distinct fingerprints, overlap pairs — has a closed-form
# DuckDB twin.
_WINNOW_ORACLE = """
    WITH docs AS (
      SELECT doc_id, text, length(text) AS L
      FROM documents WHERE doc_id < 300
    ),
    pos AS (
      SELECT doc_id, i, L - 7 AS n,
             ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 15))::BIGINT
               AS h
      FROM docs, UNNEST(range(1, L - 7 + 1)) AS t(i)
      WHERE L >= 8
    ),
    wmin AS (
      SELECT doc_id, i, n,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
      FROM pos
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= greatest(n - 15, 1)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS shared_fingerprints
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY id_a, id_b
    """


# decontamination: benchmark docs are planted substrings of corpus
# docs (ids +700000), so every benchmark doc must flag its source
_DECON_ORACLE = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
    ),
    bench AS (
      SELECT doc_id + 700000 AS doc_id, substr(text, 50, 200) AS text
      FROM documents WHERE doc_id < 5
    ),
    pos_c AS (
      SELECT doc_id, i, length(text) - 7 AS n,
             ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 15))::BIGINT
               AS h
      FROM corpus, UNNEST(range(1, length(text) - 7 + 1)) AS t(i)
      WHERE length(text) >= 8
    ),
    fps_c AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, i, n,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        FROM pos_c
      ) WHERE i <= greatest(n - 15, 1)
    ),
    pos_b AS (
      SELECT doc_id, i, length(text) - 7 AS n,
             ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 15))::BIGINT
               AS h
      FROM bench, UNNEST(range(1, length(text) - 7 + 1)) AS t(i)
      WHERE length(text) >= 8
    ),
    fps_b AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, i, n,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        FROM pos_b
      ) WHERE i <= greatest(n - 15, 1)
    )
    SELECT c.doc_id AS doc_id, b.doc_id AS benchmark_id,
           count(*) AS shared_fingerprints
    FROM fps_c c JOIN fps_b b ON c.fp = b.fp
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY 1, 2
    """


@_register("benchmark_contamination", _DECON_ORACLE)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_metrics import cross_fingerprint_overlap

    docs = _docs(spark, sf_dir)
    corpus = docs.where("doc_id < 300").select("doc_id", "text")
    bench = docs.where("doc_id < 5").select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.substring("text", 50, 200).alias("text"),
    )
    return cross_fingerprint_overlap(corpus, bench, min_shared=3)


@_register("winnowing_fingerprint_overlap", _WINNOW_ORACLE)
def q_winnowing_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_metrics import fingerprint_overlap_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    return fingerprint_overlap_pairs(docs, min_shared=3)


def _blob_lit(b: bytes) -> str:
    return "'" + "".join(f"\\x{c:02x}" for c in b) + "'::BLOB"


def _media_sql() -> str:
    """Closed-form DuckDB twin of the media feature pipeline.

    The synth payloads are deterministic functions of doc_id and the
    fake feature is md5-of-hex-of-payload, so every output column —
    including the feature digest — is SQL-expressible.
    """
    from .operators.multimodal import (
        VARIANT_DIMS,
        VARIANT_RATES,
        _audio_header_for,
        _video_duration_for,
        jpeg_header,
        mp4_header,
        png_header,
    )

    pay, width, height, depth = [], [], [], []
    chans, rates, durs = [], [], []
    for rem in range(24):
        if rem % 3 == 0:
            w, h, d = VARIANT_DIMS[rem // 6]
            hdr = png_header(w, h, d) if rem % 6 == 0 else jpeg_header(w, h)
            bd = d if rem % 6 == 0 else 8  # JPEG SOF precision is 8
            width.append(f"WHEN doc_id % 24 = {rem} THEN {w}")
            height.append(f"WHEN doc_id % 24 = {rem} THEN {h}")
            depth.append(f"WHEN doc_id % 24 = {rem} THEN {bd}")
        elif rem % 3 == 1:
            hdr = _audio_header_for(rem)
            depth.append(f"WHEN doc_id % 24 = {rem} THEN 16")
            chans.append(f"WHEN doc_id % 24 = {rem} THEN "
                         f"{1 if rem % 6 < 3 else 2}")
            rates.append(f"WHEN doc_id % 24 = {rem} THEN "
                         f"{VARIANT_RATES[rem // 6]}")
        else:
            hdr = mp4_header(_video_duration_for(rem))
            durs.append(f"WHEN doc_id % 24 = {rem} THEN "
                        f"{_video_duration_for(rem)}")
        pay.append(f"WHEN doc_id % 24 = {rem} THEN {_blob_lit(hdr)}")
    pay_case = "CASE " + " ".join(pay) + " END"
    # md5-digest bytes 0..15 as comma-joined ints == the Spark side's
    # round-trip through the float feature (exact byte recovery)
    byte_terms = ", ".join(
        f"(('0x' || substr(mh, {2 * i + 1}, 2))::INT)::VARCHAR"
        for i in range(16)
    )
    return f"""
    WITH media AS (
      SELECT doc_id,
             ({pay_case} || encode(doc_id::VARCHAR)) AS payload
      FROM documents WHERE doc_id < 500
    ),
    hashed AS (
      SELECT doc_id, payload, md5(lower(hex(payload))) AS mh FROM media
    )
    SELECT doc_id::VARCHAR AS doc_id,
           'img://' || doc_id AS media_ref,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           octet_length(payload) AS n_bytes,
           CASE WHEN doc_id % 6 = 0 THEN 'png'
                WHEN doc_id % 3 = 0 THEN 'jpeg'
                WHEN doc_id % 3 = 1 THEN 'riff' ELSE 'mp4ish' END
             AS sniffed_format,
           'decoded' AS decode_status,
           CAST(CASE {' '.join(width)} ELSE -1 END AS INT) AS width,
           CAST(CASE {' '.join(height)} ELSE -1 END AS INT) AS height,
           CAST(CASE {' '.join(depth)} ELSE -1 END AS INT) AS bit_depth,
           CAST(CASE {' '.join(chans)} ELSE -1 END AS INT) AS channels,
           CAST(CASE {' '.join(rates)} ELSE -1 END AS INT) AS sample_rate,
           CAST(CASE {' '.join(durs)} ELSE -1 END AS BIGINT) AS duration_ms,
           md5(concat_ws(',', {byte_terms})) AS feature_digest
    FROM hashed ORDER BY doc_id
    """


@_register("media_feature_extraction", _media_sql())
def q_media_feature_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_media_features, synth_media_table

    docs = _docs(spark, sf_dir).select("doc_id").where(F.col("doc_id") < 500)
    feats = extract_media_features(synth_media_table(spark, docs))
    # The fake feature is (md5_byte/255)*2-1 stored as float32 — the
    # byte recovers exactly under round(), giving a scalar digest the
    # driver can hash (array<float> columns break its canonicalizer).
    byte_strs = F.transform(
        F.col("feature"),
        lambda x: F.round((x.cast("double") + F.lit(1.0)) / 2.0 * 255.0)
        .cast("int").cast("string"),
    )
    return feats.select(
        "doc_id", "media_ref", "media_type", "n_bytes", "sniffed_format",
        "decode_status",
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("bit_depth", F.lit(-1)).alias("bit_depth"),
        F.coalesce("channels", F.lit(-1)).alias("channels"),
        F.coalesce("sample_rate", F.lit(-1)).alias("sample_rate"),
        F.coalesce("duration_ms", F.lit(-1)).cast("long")
        .alias("duration_ms"),
        F.md5(F.concat_ws(",", byte_strs)).alias("feature_digest"),
    )


# --------------------------------------------------------------------------
# As-of (point-in-time) join: each purchase annotated with the user's
# latest click at or before it — oracled against DuckDB's native
# ASOF JOIN on the identically-deduplicated right side.
# --------------------------------------------------------------------------


@_register(
    "purchases_with_last_click",
    """
    WITH clicks AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ),
    c AS (SELECT user_id, ts, value, event_id FROM clicks WHERE rn = 1),
    p AS (SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_ts_us,
           p.value::DOUBLE AS purchase_value,
           coalesce(epoch_us(c.ts), -1) AS asof_ts_us,
           coalesce(c.value, -1)::DOUBLE AS asof_value,
           coalesce(c.event_id, -1) AS asof_event_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.user_id, p.event_id
    """,
)
def q_purchases_with_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", "event_id", "ts", "value")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "ts", "value", "event_id")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts",
                       right_cols=("value", "event_id"))
    return joined.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_ts_us"),
        F.col("value").cast("double").alias("purchase_value"),
        F.coalesce(F.unix_micros(F.col("asof_ts").cast("timestamp")),
                   F.lit(-1)).alias("asof_ts_us"),
        F.coalesce(F.col("asof_value").cast("double"), F.lit(-1.0))
        .alias("asof_value"),
        F.coalesce("asof_event_id", F.lit(-1)).alias("asof_event_id"),
    )


@_register(
    "purchases_with_recent_click",
    """
    WITH clicks AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ),
    c AS (SELECT user_id, ts, value, event_id FROM clicks WHERE rn = 1),
    p AS (SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'purchase'),
    j AS (
      SELECT p.user_id, p.event_id, p.ts AS p_ts,
             CASE WHEN p.ts - c.ts <= INTERVAL '600 seconds'
                  THEN c.ts END AS m_ts,
             CASE WHEN p.ts - c.ts <= INTERVAL '600 seconds'
                  THEN c.value END AS m_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT user_id, event_id, epoch_us(p_ts) AS purchase_ts_us,
           coalesce(epoch_us(m_ts), -1) AS asof_ts_us,
           coalesce(m_value, -1)::DOUBLE AS asof_value
    FROM j ORDER BY user_id, event_id
    """,
)
def q_purchases_with_recent_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness bound: the last click only
    counts when it happened within the 600 s attribution window."""
    from .operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", "event_id", "ts", "value")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "ts", "value", "event_id")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts",
                       right_cols=("value",), tolerance=600)
    return joined.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_ts_us"),
        F.coalesce(F.unix_micros(F.col("asof_ts").cast("timestamp")),
                   F.lit(-1)).alias("asof_ts_us"),
        F.coalesce(F.col("asof_value").cast("double"), F.lit(-1.0))
        .alias("asof_value"),
    )


@_register(
    "clicks_near_purchases",
    """
    WITH p AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s, value
          FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.event_id, p.ts_s AS purchase_ts_s,
           c.event_id AS click_event_id, c.ts_s AS click_ts_s,
           c.value::DOUBLE AS click_value
    FROM p JOIN c ON p.user_id = c.user_id
                 AND c.ts_s BETWEEN p.ts_s - 300 AND p.ts_s
    ORDER BY p.user_id, p.event_id, click_event_id
    """,
)
def q_clicks_near_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: every click in the 5 minutes before each purchase,
    via time-bin bucketing (bounded fan-in, never a per-key cross
    product)."""
    from .operators.temporal import range_join

    ev = _events(spark, sf_dir).withColumn(
        "ts_s", F.unix_timestamp(F.col("ts").cast("timestamp")))
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", "event_id", "ts_s")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "event_id", "ts_s", "value")
    pairs = range_join(purchases, clicks, key="user_id", ts="ts_s",
                       lower=-300, upper=0)
    return pairs.select(
        "user_id", "event_id",
        F.col("ts_s").alias("purchase_ts_s"),
        F.col("r_event_id").alias("click_event_id"),
        F.col("r_ts_s").alias("click_ts_s"),
        F.col("r_value").cast("double").alias("click_value"),
    )


# --------------------------------------------------------------------------
# Deterministic sampling / dataset splits (content-stable md5 buckets;
# RNG sampling is not reproducible across engines, hash buckets are)
# --------------------------------------------------------------------------

_SAMPLING_BUCKET_SQL = (
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {b}"
)


def _sampling_sql() -> tuple:
    from .operators.sampling import HASH_BUCKETS, split_boundaries

    bucket = _SAMPLING_BUCKET_SQL.format(b=HASH_BUCKETS)
    sample = f"""
    SELECT doc_id FROM documents
    WHERE {bucket} < {int(0.1 * HASH_BUCKETS)}
    ORDER BY doc_id
    """
    bounds = split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    cases = " ".join(
        f"WHEN b < {upper} THEN '{name}'" for name, upper in bounds[:-1]
    )
    split = f"""
    SELECT doc_id, CASE {cases} ELSE '{bounds[-1][0]}' END AS split
    FROM (SELECT doc_id, {bucket} AS b FROM documents)
    ORDER BY doc_id
    """
    return sample, split


_SAMPLE_SQL, _SPLIT_SQL = _sampling_sql()


@_register("deterministic_sample_10pct", _SAMPLE_SQL)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import deterministic_sample

    return deterministic_sample(_docs(spark, sf_dir), 0.1).select("doc_id")


@_register("train_val_test_split", _SPLIT_SQL)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_split

    return hash_split(
        _docs(spark, sf_dir), {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def _stratified_sql() -> str:
    from .operators.sampling import HASH_BUCKETS

    bucket = _SAMPLING_BUCKET_SQL.format(b=HASH_BUCKETS)
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE {bucket} < CASE lang
      WHEN 'en' THEN {int(0.5 * HASH_BUCKETS)}
      WHEN 'de' THEN {int(0.25 * HASH_BUCKETS)}
      ELSE {int(0.05 * HASH_BUCKETS)} END
    ORDER BY doc_id
    """


@_register("stratified_language_sample", _stratified_sql())
def q_stratified_language_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir), {"en": 0.5, "de": 0.25},
        strata_col="lang", default_rate=0.05,
    ).select("doc_id", "lang")


@_register(
    "token_budget_shards",
    """
    SELECT doc_id,
           CAST(floor((sum(n) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n)
                      / 5000.0) AS INT) AS shard,
           n AS n_tokens
    FROM (SELECT doc_id, len(string_split(text, ' ')) AS n
          FROM documents)
    ORDER BY doc_id
    """,
)
def q_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import shard_by_token_budget

    return shard_by_token_budget(
        _docs(spark, sf_dir), budget_tokens=5000
    ).select("doc_id", "shard", "n_tokens")


# --------------------------------------------------------------------------
# End-to-end corpus-prep funnel: quality gate → language filter →
# exact dedup → MinHash near-dup removal → split assignment, one
# (doc_id, stage) row per input document. Exact and near duplicates
# are planted (+10000 copies, +20000 tail-modified copies of
# doc_id<30) so every stage catches real rows.
# --------------------------------------------------------------------------

_NEAR_TAIL = " extra near duplicate tail words appended"


def _corpus_prep_sql() -> str:
    from .operators.sampling import HASH_BUCKETS, split_boundaries

    hashes, bands, rows = 8, 4, 2
    mins = ", ".join(f"min(md5('{s}|' || shingle)) AS h{s}"
                     for s in range(hashes))
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({cols}) AS bucket FROM sig".format(
            b=b,
            cols=" || '|' || ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    bounds = split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    split_case = " ".join(
        f"WHEN b < {upper} THEN '{name}'" for name, upper in bounds[:-1]
    )
    bucket = _SAMPLING_BUCKET_SQL.format(b=HASH_BUCKETS)
    return f"""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 10000, text, lang FROM documents WHERE doc_id < 30
      UNION ALL
      SELECT doc_id + 20000, text || '{_NEAR_TAIL}', lang
      FROM documents WHERE doc_id < 30
    ),
    m AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS nt,
             length(text) * 1.0 / len(string_split(text, ' ')) AS atl
      FROM corpus
    ),
    d1 AS (SELECT doc_id, 'drop_quality' AS stage FROM m
           WHERE nt < 25 OR atl > 6.0),
    s1 AS (SELECT * FROM m WHERE NOT (nt < 25 OR atl > 6.0)),
    d2 AS (SELECT doc_id, 'drop_lang' AS stage FROM s1 WHERE lang <> 'en'),
    s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
    r AS (SELECT doc_id, text,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rn
          FROM s2),
    d3 AS (SELECT doc_id, 'drop_exact_dup' AS stage FROM r WHERE rn > 1),
    s3 AS (SELECT doc_id, text FROM r WHERE rn = 1),
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM s3),
    sh AS (
      SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, UNNEST(range(1, greatest(len(ws) - 1, 2))) AS t(i)
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig AS (SELECT id, {mins} FROM sh GROUP BY id),
    buckets AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      JOIN cand c ON c.id_a = a.id AND c.id_b = b.id
      GROUP BY a.id, b.id
    ),
    nearids AS (
      SELECT DISTINCT i.id_b AS doc_id
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) >= 0.4
    ),
    d4 AS (SELECT s3.doc_id, 'drop_near_dup' AS stage
           FROM s3 SEMI JOIN nearids USING (doc_id)),
    s4 AS (SELECT s3.doc_id FROM s3 ANTI JOIN nearids USING (doc_id)),
    kept AS (
      SELECT doc_id,
             'kept_' || CASE {split_case} ELSE '{bounds[-1][0]}' END AS stage
      FROM (SELECT doc_id, {bucket} AS b FROM s4)
    )
    SELECT doc_id, stage FROM d1
    UNION ALL SELECT * FROM d2
    UNION ALL SELECT * FROM d3
    UNION ALL SELECT * FROM d4
    UNION ALL SELECT * FROM kept
    ORDER BY doc_id
    """


@_register("corpus_prep_funnel", _corpus_prep_sql())
def q_corpus_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.corpus_prep import corpus_prep_funnel

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang") \
        .where("doc_id < 200")
    seeds = docs.where("doc_id < 30")
    exact = seeds.select((F.col("doc_id") + 10000).alias("doc_id"),
                         "text", "lang")
    near = seeds.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(_NEAR_TAIL)).alias("text"),
        "lang",
    )
    return corpus_prep_funnel(
        docs.unionByName(exact).unionByName(near)
    )


# --------------------------------------------------------------------------
# Corpus statistics: exact distributed percentiles + vocabulary top-k
# --------------------------------------------------------------------------


@_register(
    "length_percentiles",
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.9), 6) AS p90,
           round(quantile_cont(n_chars, 0.99), 6) AS p99,
           count(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact percentiles (linear interpolation — same definition as
    # quantile_cont), distributed via Spark's percentile aggregate
    pct = F.expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))")
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(pct.alias("p"), F.count("*").alias("n_docs"))
        .select(
            "lang",
            F.round(F.element_at("p", 1), 6).alias("p50"),
            F.round(F.element_at("p", 2), 6).alias("p90"),
            F.round(F.element_at("p", 3), 6).alias("p99"),
            "n_docs",
        )
    )


@_register(
    "vocab_top_tokens",
    """
    SELECT w AS token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY freq DESC, token
    LIMIT 50
    """,
)
def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the vocabulary-building primitive: explode → partial-agg count →
    # global top-k (map-side combine keeps the shuffle at |vocab|,
    # not |tokens|)
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# PII redaction + context-window segmentation (corpus-prep operators)
# --------------------------------------------------------------------------

# synthetic PII header prepended to each doc (corpus text itself is
# PII-free, so positives are planted — same device as the
# expand_abbreviations query)
_PII_HEADER = (
    "Contact john.doe@example.com or https://ex.com/p?q=1 "
    "call +1 (555) 123-4567 ip 192.168.1.10 then "
)


def _pii_sql() -> str:
    from .operators.redact import PII_PATTERNS

    src = f"'{_PII_HEADER}' || substr(text, 1, 60)"
    redacted = src
    counts, stage = [], src
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({stage}, '{pattern}')) AS n_{name}"
        )
        stage = f"regexp_replace({stage}, '{pattern}', '{repl}', 'g')"
        redacted = f"regexp_replace({redacted}, '{pattern}', '{repl}', 'g')"
    return f"""
    SELECT doc_id, {redacted} AS redacted, {', '.join(counts)}
    FROM documents ORDER BY doc_id
    """


@_register("pii_redaction", _pii_sql())
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.redact import redact_pii

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit(_PII_HEADER), F.substring("text", 1, 60))
        .alias("text"),
    )
    return redact_pii(docs)


@_register(
    "context_segments",
    """
    SELECT doc_id, k AS seg_id,
           array_to_string(ws[k*32+1 : k*32+48], ' ') AS seg_text
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         UNNEST(range(0, greatest(cast(ceil((len(ws) - 48) / 32.0) AS INT)
                                  + 1, 1))) AS t(k)
    ORDER BY doc_id, seg_id
    """,
)
def q_context_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.redact import segment_tokens

    return segment_tokens(_docs(spark, sf_dir), max_tokens=48, stride=32)


# --------------------------------------------------------------------------
# Raw-document ingestion, oracle-checked end-to-end. Both queries
# synthesize real raw documents (valid PDFs / full HTML pages) from
# documents.text, run the actual parser stage, and must recover the
# 12-word-chunk structure exactly — which is closed-form SQL.
# --------------------------------------------------------------------------

# chunks of 12 words joined by newline — the shared recovery target
_CHUNKED_TEXT_SQL = """
    SELECT doc_id::VARCHAR AS doc_id,
           array_to_string(
             list_transform(
               range(0, greatest(cast(ceil(len(ws) / 12.0) AS INT), 1)),
               k -> array_to_string(ws[k*12+1 : k*12+12], ' ')),
             chr(10)) AS extracted
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE doc_id < 300)
    ORDER BY doc_id
    """


def _chunked(text: str, n: int = 12) -> list:
    ws = text.split(" ")
    return [" ".join(ws[k * n:(k + 1) * n])
            for k in range(max(-(-len(ws) // n), 1))]


@_register("pdf_text_extraction", _CHUNKED_TEXT_SQL)
def q_pdf_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real round trip: text → valid Flate-compressed PDF bytes →
    stdlib content-stream parser → span table → reassembled text."""
    import pandas as pd

    from .functions.pdf_text import make_simple_pdf
    from .sources.pdf_ingest import pdf_to_spans

    docs = _docs(spark, sf_dir).where("doc_id < 300").select("doc_id", "text")

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype(str),
                "pdf": [make_simple_pdf([_chunked(t)]) for t in pdf["text"]],
            })

    pdfs = docs.mapInPandas(build, "doc_id string, pdf binary")
    spans = pdf_to_spans(pdfs)
    text = F.expr(
        "array_join(transform(array_sort(filter(spans, s -> s.kind = 'text'),"
        " (a, b) -> a.offset - b.offset), s -> s.text), '\\n')"
    )
    return spans.select("doc_id", text.alias("extracted"))


_HTML_HEAD = (
    "<html><head><title>doc</title><style>p{margin:0}</style></head><body>"
    "<header><h1>Synthetic Corpus</h1></header>"
    "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav><main>"
)
_HTML_TAIL = (
    "</main><div><a href=\"/r1\">related one</a> "
    "<a href=\"/r2\">related two</a></div>"
    "<footer>generated page</footer>"
    "<script>console.log('x')</script></body></html>"
)


@_register("html_main_content", _CHUNKED_TEXT_SQL)
def q_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real round trip: text → full HTML page (nav/header/footer/link
    farm/script boilerplate) → DOM-heuristic main-content extractor →
    the content paragraphs, exactly."""
    from .sources.html_ingest import html_main_text

    docs = _docs(spark, sf_dir).where("doc_id < 300")
    words = F.split("text", " ")
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(12)).cast("int"), F.lit(1)
    )
    paras = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.concat(
                F.lit("<p>"),
                F.array_join(F.slice(words, k * 12 + 1, 12), " "),
                F.lit("</p>"),
            ),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    pages = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit(_HTML_HEAD), paras, F.lit(_HTML_TAIL)).alias("html"),
    )
    return html_main_text(pages).select(
        "doc_id", F.col("text").alias("extracted")
    )


# --------------------------------------------------------------------------
# Watermarked windowed aggregation — batch form of the streaming
# operator (streaming/windowed_metrics.py shares this exact plan); the
# batch==stream parity pytest covers the watermark path.
# --------------------------------------------------------------------------


@_register(
    "windowed_event_metrics",
    """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start_epoch,
           epoch(date_trunc('hour', ts))::BIGINT + 3600 AS window_end_epoch,
           event_type,
           count(*) AS n_events,
           sum(value)::DOUBLE AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start_epoch, event_type
    """,
)
def q_windowed_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.windowed_metrics import windowed_event_metrics

    m = windowed_event_metrics(_events(spark, sf_dir))
    return m.select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        F.unix_timestamp("window_end").alias("window_end_epoch"),
        "event_type", "n_events", "total_value",
    )


# --------------------------------------------------------------------------
# Sessionization (batch oracle form of the stateful streaming operator)
# --------------------------------------------------------------------------


@_register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTES THEN 1
                  ELSE 0 END AS nw
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sid AS (
      SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           count(*) AS n_events,
           sum(value)::DOUBLE AS total_value
    FROM sid GROUP BY user_id, s
    ORDER BY user_id, session_start_us
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.sessionize import sessionize_batch

    return sessionize_batch(_events(spark, sf_dir), gap_minutes=30).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# Relational completeness: top-k, set operations, rollup
# --------------------------------------------------------------------------


@_register(
    "top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice::DOUBLE AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey",
                F.col("o_totalprice").cast("double").alias("total"))
        .limit(10)
    )


@_register(
    "purchasers_without_errors",
    """
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND value > 190
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND value > 190
    ORDER BY user_id
    """,
)
def q_purchasers_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    buyers = ev.where("event_type = 'purchase' AND value > 190"
                      ).select("user_id")
    erring = ev.where("event_type = 'error' AND value > 190"
                      ).select("user_id")
    return buyers.subtract(erring)  # EXCEPT (set semantics)


@_register(
    "engaged_buyers",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
    ORDER BY user_id
    """,
)
def q_engaged_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.where("event_type = 'purchase'").select("user_id")
        .intersect(ev.where("event_type = 'click'").select("user_id"))
    )


@_register(
    "pricing_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           sum(l_quantity)::BIGINT AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n",
        )
    )


@_register("ivf_topk", _ANN_TOPK_ORACLE)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same planted-duplicate contract as ann_topk_lsh: identical
    # vectors share a nearest centroid, the query's own cluster is
    # always probe #1, so IVF top-3 == brute-force top-3.
    #
    # Train-once/serve-many (VERDICT r4 #7): the quantizer is COMMITTED
    # to a per-sf snapshot table on first use; later calls load k×dim
    # instead of re-running Lloyd passes. Results are identical either
    # way (training is deterministic), so the oracle is unchanged.
    import hashlib
    import os

    from .plans.ivf_index import ivf_topk_indexed
    from .sources.tables import SnapshotTable

    corpus, queries = _planted_ann_inputs(spark, sf_dir)
    # Cache key = content fingerprint of the embeddings parquet dir
    # (names+sizes+mtimes — regenerated testdata at the same path gets
    # a FRESH key, never stale centroids) + pid (no cross-process
    # manifest races on SnapshotTable's unlocked read-modify-write),
    # under the per-user warehouse dir (not world-shared /tmp). Within
    # one process the train-once/serve-many reuse still holds.
    emb_dir = os.path.join(sf_dir, "embeddings.parquet")
    try:
        stat = sorted((e.name, e.stat().st_size, e.stat().st_mtime_ns)
                      for e in os.scandir(emb_dir))
    except OSError:
        stat = []
    fp = hashlib.md5(repr((sf_dir, stat)).encode()).hexdigest()[:12]
    cache = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        "ivf_cache", "%s_%d" % (fp, os.getpid()))
    return ivf_topk_indexed(
        spark, corpus, queries, SnapshotTable(cache), k=3, n_probes=3,
        n_centroids=8, iterations=2, sample_fraction=0.5)


# --------------------------------------------------------------------------
# Flagship pipeline, oracle-checked: on the span-ized documents corpus
# (single-line ASCII, quality gate always passes via 'primary'), every
# output metric is a closed-form function of the source text — so the
# ENTIRE extraction pipeline (sort → UDF → reassembly → metrics) gets
# driver-verified value equality, not just a rows-only check.
# --------------------------------------------------------------------------


@_register(
    "span_extraction_metrics",
    """
    SELECT doc_id::VARCHAR AS doc_id,
           'succeeded' AS status,
           'primary' AS via,
           length(text)::BIGINT AS chars_extracted,
           greatest(cast(ceil(len(string_split(text, ' ')) / 12.0) AS INT), 1)
             AS n_text_spans,
           1 AS n_media_spans
    FROM documents ORDER BY doc_id
    """,
)
def q_span_extraction_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.span_extract import extract_documents
    from .sources.spanize import spanized_documents

    return extract_documents(spanized_documents(_docs(spark, sf_dir))).select(
        "doc_id", "status", "via", "chars_extracted",
        "n_text_spans", "n_media_spans",
    )


# --------------------------------------------------------------------------
# Full MinHash near-dup pipeline with exact-Jaccard verification,
# oracle-checked end-to-end (md5 hash family is engine-portable).
# --------------------------------------------------------------------------


def _near_dup_sql(threshold: float = 0.4, hashes: int = 8,
                  bands: int = 4) -> str:
    rows = hashes // bands
    mins = ", ".join(f"min(md5('{s}|' || shingle)) AS h{s}"
                     for s in range(hashes))
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({cols}) AS bucket FROM sig".format(
            b=b,
            cols=" || '|' || ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 200
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, UNNEST(range(1, greatest(len(ws) - 1, 2))) AS t(i)
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig AS (SELECT id, {mins} FROM sh GROUP BY id),
    buckets AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      JOIN cand c ON c.id_a = a.id AND c.id_b = b.id
      GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b,
           i.n_inter / (sa.n + sb.n - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE i.n_inter / (sa.n + sb.n - i.n_inter) >= {threshold}
    ORDER BY id_a, id_b
    """


@_register("near_duplicates_minhash_full", _near_dup_sql())
def q_near_duplicates_minhash_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import near_duplicates_minhash

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return near_duplicates_minhash(docs, threshold=0.4, num_hashes=8, bands=4)


# --------------------------------------------------------------------------
# Corpus-dedup keep-list (plans/dedup_job.py): planted duplicate
# clusters (exact copy at +10000, tail-modified near-dup at +20000 of
# each doc_id < 10) make the label-propagation fixpoint closed-form.
# The oracle simulates the SAME minhash pipeline in SQL (so any
# incidental base-doc pairs are captured identically) and unrolls
# min-label propagation 6 rounds — far beyond the planted diameter.
# --------------------------------------------------------------------------

_KEEP_CORPUS_SQL = f"""
      SELECT doc_id, text FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT doc_id + 20000, text || '{_NEAR_TAIL}'
      FROM documents WHERE doc_id < 10
"""


def _keep_list_sql(threshold: float = 0.5, hashes: int = 16,
                   bands: int = 4, rounds: int = 6) -> str:
    rows = hashes // bands
    mins = ", ".join(f"min(md5('{s}|' || shingle)) AS h{s}"
                     for s in range(hashes))
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({cols}) AS bucket FROM sig".format(
            b=b,
            cols=" || '|' || ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    prop = ""
    for k in range(1, rounds + 1):
        prop += f""",
    l{k} AS (
      SELECT l.id, least(l.label, coalesce(min(n.label), l.label)) AS label
      FROM l{k - 1} l
      LEFT JOIN e ON e.src = l.id
      LEFT JOIN l{k - 1} n ON n.id = e.dst
      GROUP BY l.id, l.label
    )"""
    return f"""
    WITH c AS ({_KEEP_CORPUS_SQL}),
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM c),
    sh AS (
      SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, UNNEST(range(1, greatest(len(ws) - 1, 2))) AS t(i)
    ),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    sig AS (SELECT id, {mins} FROM sh GROUP BY id),
    buckets AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      JOIN cand x ON x.id_a = a.id AND x.id_b = b.id
      GROUP BY a.id, b.id
    ),
    pairs AS (
      SELECT i.id_a, i.id_b FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.n_inter / (sa.n + sb.n - i.n_inter) >= {threshold}
    ),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    l0 AS (SELECT doc_id AS id, doc_id AS label FROM c){prop}
    SELECT id, id = label AS keep, label AS cluster
    FROM l{rounds} ORDER BY id
    """


@_register("dedup_keep_list", _keep_list_sql())
def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.dedup_job import connected_keep_list, duplicate_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 10).select(
        "doc_id", "text")
    corpus = (
        docs
        .unionByName(docs.select((F.col("doc_id") + 10000).alias("doc_id"),
                                 "text"))
        .unionByName(docs.select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat("text", F.lit(_NEAR_TAIL)).alias("text")))
    )
    pairs = duplicate_pairs(corpus, threshold=0.5)
    return connected_keep_list(pairs, corpus)


# --------------------------------------------------------------------------
# Embedding near-duplicates (LSH-bucketed) vs a brute-force oracle:
# at threshold 0.999 the only qualifying pairs are the planted exact
# duplicates, which collide in every LSH table deterministically —
# so the bucketed result equals the DuckDB all-pairs scan.
# --------------------------------------------------------------------------

_EMB_NEAR_DUP_ORACLE = """
    WITH c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 500000 AS id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 3
    ),
    scored AS (
      SELECT a.id AS id_a, b.id AS id_b,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      FROM c a JOIN c b ON a.id < b.id
    )
    SELECT id_a, id_b, cos FROM scored
    WHERE cos >= 0.999 ORDER BY id_a, id_b
    """


@_register("embedding_near_duplicates", _EMB_NEAR_DUP_ORACLE)
def q_embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.where("vec_id < 3").select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding", "label"
    )
    return embedding_near_duplicates(
        emb.unionByName(planted), threshold=0.999, dim=64,
        tables=6, planes=8,
    )


# --------------------------------------------------------------------------
# Corpus statistics: repetition metrics (Gopher-style filters),
# intra-document line dedup, TF-IDF term weighting, unigram surprisal.
# --------------------------------------------------------------------------


@_register(
    "repetition_metrics",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT doc_id, unnest(ws) AS w FROM d),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    wstats AS (
      SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
             max(c) AS top_word_c
      FROM wc GROUP BY doc_id
    ),
    g AS (
      SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
      FROM d, UNNEST(range(1, greatest(len(ws), 2))) AS t(i)
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    gstats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_c
      FROM gc GROUP BY doc_id
    )
    SELECT w.doc_id, CAST(w.n_words AS BIGINT) AS n_words,
           round(w.n_distinct / w.n_words, 6) AS distinct_word_ratio,
           round(w.top_word_c / w.n_words, 6) AS top_word_fraction,
           round(g.top_bigram_c / g.n_bigrams, 6) AS top_bigram_fraction
    FROM wstats w JOIN gstats g USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus_stats import repetition_metrics

    return repetition_metrics(_docs(spark, sf_dir)).withColumnRenamed(
        "id", "doc_id")


@_register(
    "dedup_doc_lines",
    """
    SELECT doc_id,
           text || chr(10) || 'dup line' || chr(10) || 'tail line' AS text,
           2 AS n_lines_dropped
    FROM documents ORDER BY doc_id
    """,
)
def q_dedup_doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted multi-line construction: the doc's own text appears
    twice and a boilerplate line twice; first occurrences survive in
    order, so the result is closed-form."""
    from .operators.corpus_stats import dedup_doc_lines

    planted = F.concat_ws(
        "\n", F.col("text"), F.lit("dup line"), F.lit("dup line"),
        F.col("text"), F.lit("tail line"))
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return dedup_doc_lines(docs)


@_register(
    "global_line_dedup",
    """
    WITH d AS (
      SELECT doc_id,
             text || chr(10) || 'shared ' || (doc_id % 7)::VARCHAR
                  || chr(10) || 'tail line' AS text
      FROM documents
    ),
    s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
    l AS (
      SELECT doc_id, i - 1 AS idx, ls[i] AS line
      FROM s, UNNEST(range(1, len(ls) + 1)) AS t(i)
    ),
    r AS (
      SELECT doc_id, idx, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, idx) AS rn,
             length(line) >= 1 AS elig
      FROM l
    ),
    kept AS (SELECT doc_id, idx, line FROM r WHERE NOT elig OR rn = 1),
    agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    orig AS (
      SELECT doc_id, len(string_split(text, chr(10))) AS n_lines FROM d
    )
    SELECT o.doc_id, coalesce(a.text, '') AS text,
           (o.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_lines_dropped
    FROM orig o LEFT JOIN agg a USING (doc_id)
    ORDER BY o.doc_id
    """,
)
def q_global_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document line dedup, first occurrence wins.

    Planted construction: every doc gains a 'shared k' line (k =
    doc_id % 7, so ~1/7 of the corpus shares each) and a 'tail line'
    shared by ALL docs; only the lowest-(doc_id, idx) copy of each
    repeated line survives. The oracle replays the full pipeline in
    SQL (window keeper election + reassembly), so organic text
    collisions dedup identically in both engines.
    """
    from .operators.dedup import dedup_lines_global

    planted = F.concat_ws(
        "\n", F.col("text"),
        F.concat(F.lit("shared "), (F.col("doc_id") % 7).cast("string")),
        F.lit("tail line"))
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return dedup_lines_global(docs).orderBy("doc_id")


@_register(
    "mixture_reweighting",
    """
    WITH per AS (
      SELECT lang AS stratum, count(*) AS n_docs,
             sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    tgt AS (
      SELECT stratum,
             CASE stratum WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3
                          WHEN 'fr' THEN 0.2 ELSE 0.0 END AS target_share
      FROM per
    )
    SELECT p.stratum, p.n_docs, p.n_tokens,
           round(p.n_tokens / (SELECT t FROM tot), 6) AS actual_share,
           round(g.target_share, 6)::DOUBLE AS target_share,
           round(least(g.target_share
                       / (p.n_tokens / (SELECT t FROM tot)), 10.0), 6)
             AS weight
    FROM per p JOIN tgt g USING (stratum)
    ORDER BY p.stratum
    """,
)
def q_mixture_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting input: per-language token
    shares vs a 50/30/20 en/de/fr target; weight = capped
    target/actual sampling multiplier (0 for strata outside the
    target mix)."""
    from .operators.sampling import mixture_weights

    return mixture_weights(
        _docs(spark, sf_dir), {"en": 0.5, "de": 0.3, "fr": 0.2},
        stratum_col="lang")


@_register(
    "tfidf_top_terms",
    """
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    scored AS (
      SELECT tf.doc_id, tf.w AS term, tf.tf, dfreq.df,
             round(tf.tf * ln((SELECT count(*) FROM d) / dfreq.df), 6)
               AS score
      FROM tf JOIN dfreq USING (w)
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, rank
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus_stats import tf_idf_top_terms

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return tf_idf_top_terms(docs, k=3).withColumnRenamed("id", "doc_id")


@_register(
    "unigram_surprisal",
    """
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
    v AS (SELECT w, count(*) AS c FROM w GROUP BY w),
    t AS (SELECT sum(c) AS total FROM v)
    SELECT doc_id, count(*) AS n_words,
           round(avg(-ln(v.c / (SELECT total FROM t))), 6)
             AS mean_surprisal
    FROM w JOIN v USING (w)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus_stats import unigram_surprisal

    return unigram_surprisal(_docs(spark, sf_dir)).withColumnRenamed(
        "id", "doc_id")


_LM_PPL_ORACLE_CTES = """
    WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
    sc AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 2),
    tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM tr),
    tp AS (
      SELECT doc_id, CASE WHEN i > 1 THEN ws[i - 1] END AS prev,
             ws[i] AS cur
      FROM tw, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    bg AS (SELECT prev, cur, count(*) AS bc FROM tp
           WHERE prev IS NOT NULL GROUP BY prev, cur),
    ctx AS (SELECT prev, sum(bc) AS uc FROM bg GROUP BY prev),
    ug AS (SELECT cur, count(*) AS c FROM tp GROUP BY cur),
    st AS (SELECT (sum(c) + count(*))::DOUBLE AS tv FROM ug),
    sw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM sc),
    sp AS (
      SELECT doc_id, CASE WHEN i > 1 THEN ws[i - 1] END AS prev,
             ws[i] AS cur
      FROM sw, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    j AS (
      SELECT sp.doc_id,
             0.7::DOUBLE * coalesce(bg.bc / ctx.uc, 0.0)
             + (1.0::DOUBLE - 0.7::DOUBLE)
               * ((coalesce(ug.c, 0) + 1.0) / (SELECT tv FROM st)) AS p
      FROM sp LEFT JOIN bg ON sp.prev = bg.prev AND sp.cur = bg.cur
              LEFT JOIN ctx ON sp.prev = ctx.prev
              LEFT JOIN ug ON sp.cur = ug.cur
    ),
    scored AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             round(exp(-avg(ln(p))), 6) AS ppl
      FROM j GROUP BY doc_id
    )
"""


@_register(
    "lm_perplexity_scores",
    _LM_PPL_ORACLE_CTES + """
    SELECT doc_id, n_tokens, ppl FROM scored ORDER BY doc_id
    """,
)
def q_lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus LM scoring: a quarter of doc_ids is the
    reference (training) corpus, a disjoint quarter is scored.
    The oracle replays the interpolated-bigram model end to end."""
    from .operators.corpus_stats import lm_perplexity

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 4 == 0)
    score = docs.where(F.col("doc_id") % 4 == 2)
    return (lm_perplexity(train, score, lam=0.7)
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


@_register(
    "ccnet_perplexity_buckets",
    _LM_PPL_ORACLE_CTES + """
    , ranked AS (
      SELECT doc_id, n_tokens, ppl,
             percent_rank() OVER (ORDER BY ppl) AS pr
      FROM scored
    )
    SELECT doc_id, n_tokens, ppl,
           least(floor(pr * 3) + 1, 3)::INT AS ppl_bucket
    FROM ranked ORDER BY doc_id
    """,
)
def q_ccnet_perplexity_buckets(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Head/middle/tail perplexity terciles over the scored half of
    the corpus — the CCNet keep-the-head filter input. Bucketing runs
    on the two-pass partitioned CDF (no global-order window); the
    oracle's percent_rank has identical min-rank tie semantics."""
    from .operators.corpus_stats import lm_perplexity, perplexity_buckets

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 4 == 0)
    score = docs.where(F.col("doc_id") % 4 == 2)
    scored = lm_perplexity(train, score, lam=0.7)
    return (perplexity_buckets(scored, k=3)
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


@_register(
    "robots_noindex_filter",
    """
    SELECT doc_id, lang FROM documents
    WHERE doc_id % 5 IN (2, 3) ORDER BY doc_id
    """,
)
def q_robots_noindex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level consent filter: pages rendered with planted robots
    metas — doc_id%5==0 'noindex, follow', 1 'NONE', 4
    'NoIndex,nofollow' are dropped (case-insensitive, 'none' implies
    noindex); 2 'index, follow' and 3 (no robots meta) survive."""
    from .operators.weblinks import drop_noindex_pages

    k = F.col("doc_id") % 5
    meta = (
        F.when(k == 0, F.lit('<meta name="robots" content="noindex, follow">'))
        .when(k == 1, F.lit('<meta name="ROBOTS" content="NONE">'))
        .when(k == 2, F.lit('<meta name="robots" content="index, follow">'))
        .when(k == 4, F.lit('<meta name="robots" content="NoIndex,nofollow">'))
        .otherwise(F.lit(""))
    )
    page = F.concat(
        F.lit("<html><head>"), meta,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"))
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", page.alias("html"))
    return (drop_noindex_pages(docs)
            .select("doc_id", "lang").orderBy("doc_id"))


@_register(
    "global_boilerplate_removal",
    """
    WITH d AS (
      SELECT doc_id,
             text || chr(10) || 'shared boilerplate footer' || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN 'even footer'
                  ELSE 'unique tail ' || doc_id END AS text
      FROM documents
    ),
    l AS (
      SELECT doc_id, i AS pos, ls[i] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
           UNNEST(range(1, len(ls) + 1)) AS t(i)
    ),
    b AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line
      ) WHERE nd >= 3
    ),
    k AS (SELECT l.* FROM l ANTI JOIN b USING (line))
    SELECT d.doc_id,
           coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text,
           CAST(len(string_split(d.text, chr(10))) - count(k.line) AS INT)
             AS n_lines_dropped
    FROM d LEFT JOIN k USING (doc_id)
    GROUP BY d.doc_id, d.text
    ORDER BY d.doc_id
    """,
)
def q_global_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (CCNet-style): a footer
    planted into every document and another into every even document
    both vanish; per-document unique tails survive. The oracle
    simulates the same rule, so incidental cross-document text
    collisions in the base corpus are captured identically."""
    from .operators.corpus_stats import drop_global_boilerplate

    planted = F.concat(
        F.col("text"), F.lit("\nshared boilerplate footer\n"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("even footer"))
        .otherwise(F.concat(F.lit("unique tail "), F.col("doc_id"))),
    )
    docs = _docs(spark, sf_dir).select("doc_id", planted.alias("text"))
    return drop_global_boilerplate(docs, min_docs=3)


@_register(
    "mixed_format_ingestion",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'pdf' WHEN 1 THEN 'html' ELSE 'text'
           END AS format,
           text
    FROM documents ORDER BY doc_id
    """,
)
def q_mixed_format_ingestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mixed-crawl round trip: each document's text is
    packaged as real PDF bytes, a real HTML page, or plain UTF-8 by
    doc_id, then the format-sniffing router parses it back — the
    recovered text must equal the original for every format."""
    import pandas as pd

    from .functions.pdf_text import make_simple_pdf
    from .sources.ingest_router import raw_to_spans

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def build(batches):
        for b in batches:
            payloads = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                k = int(doc_id) % 3
                if k == 0:
                    payloads.append(make_simple_pdf([[text]]))
                elif k == 1:
                    payloads.append(
                        ("<html><head><title>t</title></head><body>"
                         f"<p>{text}</p></body></html>").encode())
                else:
                    payloads.append(text.encode())
            yield pd.DataFrame({"doc_id": b["doc_id"].astype(str),
                                "payload": payloads})

    raw = docs.mapInPandas(build, schema="doc_id string, payload binary")
    routed = raw_to_spans(raw)
    return routed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "format",
        F.array_join(
            F.transform(F.col("spans"), lambda s: s["text"]), "\n"
        ).alias("text"),
    )


@_register(
    "deterministic_shuffle",
    """
    SELECT doc_id, md5('ep1:' || doc_id::VARCHAR) AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id
    """,
)
def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import deterministic_shuffle

    return deterministic_shuffle(
        _docs(spark, sf_dir).select("doc_id"), seed="ep1")


@_register(
    "length_bucket_stats",
    """
    WITH b AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             CAST(floor(log2(len(string_split(text, ' ')))) AS INT)
               AS len_bucket
      FROM documents
    )
    SELECT len_bucket, count(*) AS n_docs,
           min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
    FROM b GROUP BY len_bucket ORDER BY len_bucket
    """,
)
def q_length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import length_buckets

    return (
        length_buckets(_docs(spark, sf_dir))
        .groupBy("len_bucket")
        .agg(F.count("*").alias("n_docs"),
             F.min("n_tokens").alias("min_tokens"),
             F.max("n_tokens").alias("max_tokens"))
    )


@_register(
    "language_slice_divergence",
    """
    WITH w AS (SELECT lang AS s, unnest(string_split(text, ' ')) AS w
               FROM documents),
    sc AS (SELECT s, w, count(*) AS c FROM w GROUP BY s, w),
    st AS (SELECT s, sum(c) AS t FROM sc GROUP BY s),
    gc AS (SELECT w, sum(c) AS gc FROM sc GROUP BY w),
    gt AS (SELECT sum(gc) AS total FROM gc)
    SELECT sc.s AS lang,
           CAST(sum(sc.c) AS BIGINT) AS n_tokens,
           round(sum((sc.c / st.t)
                     * ln((sc.c / st.t)
                          / (gc.gc / (SELECT total FROM gt)))), 6)
             AS kl_divergence
    FROM sc JOIN st USING (s) JOIN gc USING (w)
    GROUP BY sc.s ORDER BY lang
    """,
)
def q_language_slice_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus_stats import slice_divergence

    return slice_divergence(_docs(spark, sf_dir), slice_col="lang")


# containment variant of the decontamination check: the fraction of a
# benchmark doc's fingerprints found in each corpus doc. The planted
# benchmark docs are substrings of their sources, so containment ≈ 1
# for the true pairs.
_CONTAINMENT_ORACLE = _DECON_ORACLE.replace(
    """    SELECT c.doc_id AS doc_id, b.doc_id AS benchmark_id,
           count(*) AS shared_fingerprints
    FROM fps_c c JOIN fps_b b ON c.fp = b.fp
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY 1, 2
    """,
    """    , sizes AS (SELECT doc_id, count(*) AS nb FROM fps_b GROUP BY doc_id)
    SELECT c.doc_id AS doc_id, b.doc_id AS benchmark_id,
           count(*) AS shared_fingerprints,
           round(count(*) / any_value(s.nb), 6) AS containment
    FROM fps_c c JOIN fps_b b ON c.fp = b.fp
    JOIN sizes s ON s.doc_id = b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY 1, 2
    """,
)
assert "containment" in _CONTAINMENT_ORACLE  # the replace must hit


@_register("benchmark_containment", _CONTAINMENT_ORACLE)
def q_benchmark_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_metrics import cross_fingerprint_overlap

    docs = _docs(spark, sf_dir)
    corpus = docs.where("doc_id < 300").select("doc_id", "text")
    bench = docs.where("doc_id < 5").select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.substring("text", 50, 200).alias("text"),
    )
    return cross_fingerprint_overlap(corpus, bench, min_shared=3,
                                     with_containment=True)


@_register(
    "event_sequence_funnel",
    """
    WITH s1 AS (
      SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS p1
      FROM events
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts > p1 THEN ts END)
                  OVER (PARTITION BY user_id) AS p2 FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > p2 THEN ts END)
                  OVER (PARTITION BY user_id) AS p3 FROM s2
    ),
    s4 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > p3 THEN ts END)
                  OVER (PARTITION BY user_id) AS p4 FROM s3
    ),
    agg AS (
      SELECT user_id, any_value(p1) AS p1, any_value(p2) AS p2,
             any_value(p3) AS p3, any_value(p4) AS p4
      FROM s4 GROUP BY user_id
    )
    SELECT user_id,
           coalesce(epoch_us(p1), -1) AS step_1_us,
           coalesce(epoch_us(p2), -1) AS step_2_us,
           coalesce(epoch_us(p3), -1) AS step_3_us,
           coalesce(epoch_us(p4), -1) AS step_4_us,
           CAST((p1 IS NOT NULL)::INT + (p2 IS NOT NULL)::INT
                + (p3 IS NOT NULL)::INT + (p4 IS NOT NULL)::INT AS INT)
             AS steps_completed
    FROM agg ORDER BY user_id
    """,
)
def q_event_sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→view→click→purchase funnel per user — one key
    shuffle for the whole chain."""
    from .operators.temporal import sequence_funnel

    out = sequence_funnel(
        _events(spark, sf_dir),
        steps=("signup", "view", "click", "purchase"),
    )
    cols = [F.col("user_id")]
    for i in range(1, 5):
        cols.append(
            F.coalesce(
                F.unix_micros(F.col(f"step_{i}_ts").cast("timestamp")),
                F.lit(-1)).alias(f"step_{i}_us"))
    cols.append("steps_completed")
    return out.select(*cols)


@_register(
    "cohort_retention",
    """
    WITH first_signup AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT e.user_id,
             CAST(date_trunc('day', f.signup_ts) AS DATE) AS cohort_day,
             CAST(floor(date_diff('day',
                                  CAST(date_trunc('day', f.signup_ts) AS DATE),
                                  CAST(date_trunc('day', e.ts) AS DATE))
                        / 7.0) AS INT) AS week_offset
      FROM events e JOIN first_signup f USING (user_id)
      WHERE e.ts >= f.signup_ts
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, week_offset,
           count(DISTINCT user_id) AS active_users
    FROM activity GROUP BY 1, 2
    ORDER BY cohort_day, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-signup day, counted
    distinct in each 7-day offset bucket of later activity."""
    ev = _events(spark, sf_dir)
    first_signup = (
        ev.where("event_type = 'signup'")
        .groupBy("user_id").agg(F.min("ts").alias("signup_ts"))
    )
    activity = (
        ev.join(first_signup, on="user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .select(
            "user_id",
            F.date_trunc("day", "signup_ts").cast("date")
            .alias("cohort_day"),
            F.floor(
                F.datediff(F.date_trunc("day", "ts").cast("date"),
                           F.date_trunc("day", "signup_ts").cast("date"))
                / 7).cast("int").alias("week_offset"),
        )
    )
    return (
        activity.groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        # string, not DATE: temporal driver-output columns have
        # canonicalizer hazards (see CLAUDE.md oracle notes)
        .withColumn("cohort_day", F.col("cohort_day").cast("string"))
    )


@_register(
    "daily_revenue_moving_avg",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value)::DOUBLE AS revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, round(revenue, 6) AS revenue,
           round(avg(revenue) OVER (
             ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                               AND CURRENT ROW), 6) AS revenue_7d_ma
    FROM daily ORDER BY day
    """,
)
def q_daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue with a 7-day trailing moving average.

    The window runs over the DAILY AGGREGATE (calendar-bounded — a few
    thousand rows regardless of corpus size), so the unpartitioned
    range window is metadata-scale, not data-scale."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.where("event_type = 'purchase'")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum("value").cast("double").alias("revenue"))
    )
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_num).rangeBetween(-6, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),  # scalar-safe output
        F.round("revenue", 6).alias("revenue"),
        F.round(F.avg("revenue").over(w), 6).alias("revenue_7d_ma"),
    )


@_register(
    "props_json_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS k_sum,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6)
             AS k_avg,
           min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the events.props JSON column parsed
    with a declared schema (from_json — Catalyst-native, pushdown-
    friendly) and aggregated per event type."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.IntegerType())])
    ev = _events(spark, sf_dir).withColumn(
        "k", F.from_json("props", schema)["k"])
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.round(F.avg("k"), 6).alias("k_avg"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@_register(
    "html_metadata_extraction",
    """
    SELECT doc_id,
           'doc ' || doc_id AS title,
           lang,
           'https://example.org/' || doc_id AS canonical,
           2 AS n_links,
           1 AS n_images
    FROM documents ORDER BY doc_id
    """,
)
def q_html_metadata_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip: each document rendered as a full HTML page with
    known metadata, parsed back by the stdlib metadata extractor."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .functions.html_extract import html_metadata

    page = F.concat(
        F.lit("<html lang=\""), F.col("lang"),
        F.lit("\"><head><title>doc "), F.col("doc_id").cast("string"),
        F.lit("</title><link rel=\"canonical\" href="
              "\"https://example.org/"), F.col("doc_id").cast("string"),
        F.lit("\"></head><body><p>"), F.col("text"),
        F.lit("</p><a href=\"/a\">one</a><a href=\"/b\">two</a>"
              "<img src=\"x.png\"/></body></html>"),
    )

    @pandas_udf("title string, lang string, canonical string, "
                "n_links int, n_images int")
    def meta_udf(pages: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([html_metadata(p) for p in pages])[
            ["title", "lang", "canonical", "n_links", "n_images"]]

    return (
        _docs(spark, sf_dir)
        .select("doc_id", meta_udf(page).alias("m"))
        .select("doc_id", "m.title", "m.lang", "m.canonical",
                "m.n_links", "m.n_images")
    )


@_register(
    "bigram_surprisal",
    """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    e AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM s, UNNEST(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    b AS (SELECT w1, w2, count(*) AS bc FROM e GROUP BY w1, w2),
    u AS (SELECT w1, sum(bc) AS uc FROM b GROUP BY w1)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(-ln(b.bc / u.uc)), 6) AS mean_bigram_surprisal
    FROM e JOIN b USING (w1, w2) JOIN u USING (w1)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus_stats import bigram_surprisal

    return bigram_surprisal(_docs(spark, sf_dir)).withColumnRenamed(
        "id", "doc_id")


@_register(
    "length_percentile_ranks",
    """
    SELECT doc_id, n_chars,
           round(percent_rank() OVER (ORDER BY n_chars), 6) AS pct_rank
    FROM documents ORDER BY doc_id
    """,
)
def q_length_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percent_rank without a global sort: value-histogram CDF
    broadcast back onto the rows (operators/corpus_stats.py)."""
    from .operators.corpus_stats import percentile_ranks

    return percentile_ranks(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), "n_chars")


@_register(
    "session_windows_native",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           count(*) AS n_events
    FROM islands GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def q_session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst's native session_window (30-minute gap) vs the classic
    gaps-and-islands SQL — the declarative twin of the custom stateful
    sessionizer in streaming/sessionize.py."""
    ev = _events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .drop("session_window")
    )


@_register(
    "flatten_props_json",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id
    """,
)
def q_flatten_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-inferred JSON flattening: the props column becomes a
    typed top-level field with no declared schema anywhere."""
    from .operators.semistructured import flatten_json

    ev = _events(spark, sf_dir).select("event_id", "event_type", "props")
    return flatten_json(ev, "props")


@_register(
    "user_event_pivot",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one count column per event type.
    Explicit pivot values keep the plan a single pass (no distinct-
    values pre-query) — the scale-correct pivot form."""
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@_register(
    "event_grouping_sets",
    """
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(epoch_us(ts) // 3600000000, -1) AS hour_bucket,
           count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type, epoch_us(ts) // 3600000000),
                            (event_type), ())
    ORDER BY event_type, hour_bucket
    """,
)
def q_event_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregation in ONE pass via grouping sets:
    (type, hour), (type), and the grand total."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         / F.lit(3600000000)).cast("long").alias("hour_bucket"),
    )
    return (
        ev.groupingSets(
            [["event_type", "hour_bucket"], ["event_type"], []],
            "event_type", "hour_bucket")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("hour_bucket", F.lit(-1)).alias("hour_bucket"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Round 4 — web-link operators (URL/domain filtering family) and
# corpus-hygiene additions.  URLs are PLANTED deterministically from
# doc_id (closed-form scaffold) so the oracle can state the expected
# result in pure arithmetic while the Spark side exercises the real
# regexp parser / suffix-join machinery.
# --------------------------------------------------------------------------

def _planted_url() -> "F.Column":
    """https://{www.|blog.|}site{doc_id%5}{.com|.org}/p/{doc_id%7}"""
    return F.concat(
        F.lit("https://"),
        F.element_at(F.array(F.lit("www."), F.lit("blog."), F.lit("")),
                     (F.col("doc_id") % 3 + 1).cast("int")),
        F.lit("site"), (F.col("doc_id") % 5).cast("string"),
        F.element_at(F.array(F.lit(".com"), F.lit(".org")),
                     (F.col("doc_id") % 2 + 1).cast("int")),
        F.lit("/p/"), (F.col("doc_id") % 7).cast("string"),
    )


_PLANTED_URL_SQL = (
    "'https://' || CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' "
    "ELSE '' END || 'site' || (doc_id % 5)::VARCHAR || "
    "CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END || "
    "'/p/' || (doc_id % 7)::VARCHAR"
)


@_register(
    "url_domain_stats",
    f"""
    WITH u AS (
      SELECT doc_id, n_chars,
             CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
                  ELSE '' END
               || 'site' || (doc_id % 5)::VARCHAR
               || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END
               AS host,
             'site' || (doc_id % 5)::VARCHAR
               || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END
               AS domain
      FROM documents
    )
    SELECT domain,
           count(*) AS n_docs,
           count(DISTINCT host) AS n_hosts,
           round(avg(2.0), 6) AS avg_path_depth,
           round(avg(n_chars), 6) AS avg_chars
    FROM u GROUP BY domain ORDER BY domain
    """,
)
def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus stats over planted URLs: the real regexp URL
    parser + one map-side-combinable aggregation; the oracle states
    the closed-form expectation (path depth is 2 by construction)."""
    from .operators.weblinks import domain_stats

    wu = _docs(spark, sf_dir).withColumn("url", _planted_url())
    return domain_stats(wu).orderBy("domain")


@_register(
    "blocked_domain_filter",
    """
    SELECT doc_id FROM documents
    WHERE NOT (doc_id % 10 = 0 OR doc_id % 30 = 1)
    ORDER BY doc_id
    """,
)
def q_blocked_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-blocklist filtering (domain + subdomain suffix semantics)
    as a bounded suffix explode + equi-join — never a LIKE scan.
    Blocklist: all of site0.com (=> doc_id%10==0: every host under the
    domain) and the single host blog.site1.org (=> doc_id%30==1)."""
    from .operators.weblinks import filter_blocked_domains

    wu = _docs(spark, sf_dir).select("doc_id", _planted_url().alias("url"))
    bl = spark.createDataFrame(
        [("site0.com",), ("blog.site1.org",)], ["blocked_domain"])
    return (filter_blocked_domains(wu, bl)
            .select("doc_id").orderBy("doc_id"))


def _pagerank_sql(iterations: int = 3, n: int = 25, d: float = 0.85) -> str:
    """Unrolled PageRank on the planted 25-node graph
    (i -> (2i+1)%25, i -> (3i+2)%25; every node has out-degree 2, so
    no dangling mass). Same unrolled-fixpoint pattern as
    dedup_keep_list."""
    base = f"(1.0 - {d}) / {n}"
    ctes = [
        f"nodes AS (SELECT range AS node FROM range({n}))",
        f"edges AS (SELECT range AS src, (range*2+1) % {n} AS dst "
        f"FROM range({n}) UNION ALL "
        f"SELECT range, (range*3+2) % {n} FROM range({n}))",
        f"r0 AS (SELECT node, 1.0/{n} AS rank FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"r{k} AS (SELECT n.node, {base} + {d} * "
            f"coalesce(s.received, 0.0) AS rank FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum(r.rank / 2.0) AS received "
            f"FROM edges e JOIN r{k-1} r ON r.node = e.src "
            f"GROUP BY e.dst) s ON s.node = n.node)"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
            + " ORDER BY node")


def _hits_sql(iterations: int = 2, n: int = 25) -> str:
    """Unrolled HITS on the planted 25-node graph (same edges as
    PageRank). Each half-step: spread + L2 normalization via a scalar
    subquery."""
    ctes = [
        f"nodes AS (SELECT range AS node FROM range({n}))",
        f"edges AS (SELECT range AS src, (range*2+1) % {n} AS dst "
        f"FROM range({n}) UNION ALL "
        f"SELECT range, (range*3+2) % {n} FROM range({n}))",
        "h0 AS (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    prev_h = "h0"
    for k in range(1, iterations + 1):
        ctes += [
            f"a{k}r AS (SELECT n.node, coalesce(s.v, 0.0) AS v FROM "
            f"nodes n LEFT JOIN (SELECT e.dst AS node, sum(h.hub) AS v "
            f"FROM edges e JOIN {prev_h} h ON h.node = e.src "
            f"GROUP BY e.dst) s ON s.node = n.node)",
            f"a{k} AS (SELECT node, v / (SELECT sqrt(sum(v*v)) "
            f"FROM a{k}r) AS auth FROM a{k}r)",
            f"h{k}r AS (SELECT n.node, coalesce(s.v, 0.0) AS v FROM "
            f"nodes n LEFT JOIN (SELECT e.src AS node, sum(a.auth) AS v "
            f"FROM edges e JOIN a{k} a ON a.node = e.dst "
            f"GROUP BY e.src) s ON s.node = n.node)",
            f"h{k} AS (SELECT node, v / (SELECT sqrt(sum(v*v)) "
            f"FROM h{k}r) AS hub FROM h{k}r)",
        ]
        prev_h = f"h{k}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT a.node, round(a.auth, 6) AS auth, "
            f"round(h.hub, 6) AS hub "
            f"FROM a{iterations} a JOIN h{iterations} h USING (node) "
            "ORDER BY node")


@_register("domain_hits", _hits_sql())
def q_domain_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities on the planted graph — alternating
    L2-normalized power iteration, all-DataFrame; oracle is the
    2-step unrolled fixpoint."""
    from .operators.weblinks import hits_scores

    edges = spark.range(25).select(
        F.col("id").alias("src"), ((F.col("id") * 2 + 1) % 25).alias("dst")
    ).unionByName(spark.range(25).select(
        F.col("id").alias("src"), ((F.col("id") * 3 + 2) % 25).alias("dst")))
    return (hits_scores(edges, iterations=2)
            .select("node", F.round("auth", 6).alias("auth"),
                    F.round("hub", 6).alias("hub"))
            .orderBy("node"))


@_register("domain_pagerank", _pagerank_sql())
def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph PageRank (domain quality weighting) — all-DataFrame
    iterative with per-round localCheckpoint, no driver-side graph.
    Planted 25-node graph; oracle is the unrolled 3-step fixpoint."""
    from .operators.weblinks import page_rank

    edges = spark.range(25).select(
        F.col("id").alias("src"), ((F.col("id") * 2 + 1) % 25).alias("dst")
    ).unionByName(spark.range(25).select(
        F.col("id").alias("src"), ((F.col("id") * 3 + 2) % 25).alias("dst")))
    return (page_rank(edges, iterations=3)
            .select("node", F.round("rank", 6).alias("rank"))
            .orderBy("node"))


@_register(
    "mojibake_scores",
    """
    WITH m AS (
      SELECT doc_id,
             text || CASE doc_id % 3
                       WHEN 0 THEN ' Ã©x'
                       WHEN 1 THEN ' â€œy Â z'
                       ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '(Ã[-¿]|â€.|�|Â )'))
             AS mojibake_count,
           round(len(regexp_extract_all(t,
                     '(Ã[-¿]|â€.|�|Â )')) * 100.0
                 / length(t), 6) AS mojibake_per_100_chars
    FROM m ORDER BY doc_id
    """,
)
def q_mojibake_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-corruption scoring (double-decoded UTF-8 / cp1252
    artifacts) — pure-JVM regexp_count projection. Mojibake is PLANTED
    by doc_id%3 so the oracle sees known counts on real text."""
    from .operators.text_metrics import mojibake_score

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"), F.element_at(
            F.array(F.lit(" Ã©x"), F.lit(" â€œy Â z"), F.lit("")),
            (F.col("doc_id") % 3 + 1).cast("int"))),
    )
    return mojibake_score(docs).orderBy("doc_id")


@_register(
    "normalized_dedup_groups",
    """
    WITH u AS (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, upper(text) FROM documents
    ),
    k AS (
      SELECT id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
               AS norm_key
      FROM u
    )
    SELECT min(id) AS id, norm_key, count(*) AS group_size
    FROM k GROUP BY norm_key ORDER BY id
    """,
)
def q_normalized_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-exact dedup via normalization key (lowercase, strip
    punctuation, collapse whitespace, md5): catches re-encoded /
    re-cased copies exact hashing misses, at exact-dedup cost. The
    corpus is unioned with planted UPPERCASED copies; every group must
    collapse to the original id."""
    from .operators.dedup import drop_normalized_duplicates

    docs = _docs(spark, sf_dir)
    u = docs.select(F.col("doc_id").alias("doc_id"), "text").unionByName(
        docs.select((F.col("doc_id") + 10000000).alias("doc_id"),
                    F.upper("text").alias("text")))
    return drop_normalized_duplicates(u).orderBy("id")


@_register(
    "weighted_doc_sample",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5('ws|' || doc_id::VARCHAR), 1, 8))
                 ::BIGINT::DOUBLE + 1.0) / 4294967297.0)
               / n_chars AS es_key
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars FROM keyed
      ORDER BY es_key DESC, doc_id LIMIT 100
    ) ORDER BY doc_id
    """,
)
def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES, inclusion probability ~ n_chars):
    one projection + TakeOrderedAndProject top-k — no global sort,
    resumable, engine-portable (the oracle replays the identical
    hash-uniform keys)."""
    from .operators.sampling import weighted_sample_topk

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return (weighted_sample_topk(docs, "n_chars", 100, key_col="doc_id",
                                 seed="ws")
            .orderBy("doc_id"))


@_register(
    "zipf_law_fit",
    """
    WITH vocab AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(regexp_split_to_array(text, ' ')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    top AS (
      SELECT w, c FROM vocab ORDER BY c DESC, w ASC LIMIT 100
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS r FROM top
    )
    SELECT count(*)::BIGINT AS n_terms,
           round(regr_slope(ln(c::DOUBLE), ln(r::DOUBLE)), 6) AS zipf_slope,
           round(regr_intercept(ln(c::DOUBLE), ln(r::DOUBLE)), 6)
             AS zipf_intercept
    FROM ranked
    """,
)
def q_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law log-log fit over the top-100 vocabulary — corpus
    naturalness check. Distributed top-k (TakeOrderedAndProject) +
    one regr_slope aggregate over the bounded top frame."""
    from .operators.corpus_stats import zipf_slope

    return zipf_slope(_docs(spark, sf_dir), top_n=100)


@_register(
    "gopher_quality_signals",
    """
    WITH m AS (
      SELECT doc_id,
             text || CASE doc_id % 4
               WHEN 0 THEN ''
               WHEN 1 THEN e'\\n- first bullet\\n- second bullet'
               WHEN 2 THEN e'\\nwait for it...\\nmore to come...'
               ELSE ' ### ### ###' END AS t
      FROM documents
    ),
    sig AS (
      SELECT doc_id, t,
             list_filter(str_split(t, ' '), w -> w <> '') AS words,
             list_filter(str_split(t, e'\\n'), l -> l <> '') AS lines
      FROM m
    ),
    s2 AS (
      SELECT doc_id,
        len(words) AS n_words,
        CASE WHEN len(words) > 0 THEN
          round(list_sum(list_transform(words, w -> length(w)))::DOUBLE
                / len(words), 6) ELSE 0.0 END AS mean_word_length,
        CASE WHEN len(words) > 0 THEN
          round((len(regexp_extract_all(t, '#'))
                 + len(regexp_extract_all(t, '\\.\\.\\.')))::DOUBLE
                / len(words), 6) ELSE 0.0 END AS symbol_word_ratio,
        CASE WHEN len(lines) > 0 THEN
          round(len(list_filter(lines,
                    l -> regexp_matches(l, '^\\s*[-*•]')))::DOUBLE
                / len(lines), 6) ELSE 0.0 END AS bullet_line_frac,
        CASE WHEN len(lines) > 0 THEN
          round(len(list_filter(lines,
                    l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))::DOUBLE
                / len(lines), 6) ELSE 0.0 END AS ellipsis_line_frac,
        CASE WHEN len(words) > 0 THEN
          round(len(list_filter(words,
                    w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
                / len(words), 6) ELSE 0.0 END AS alpha_word_frac,
        len(list_intersect(
              list_distinct(list_filter(str_split(lower(t), ' '),
                                        w -> w <> '')),
              ['the','be','to','of','and','that','have','with']))
          AS n_stopwords
      FROM sig
    )
    SELECT doc_id, n_words, mean_word_length, symbol_word_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
           n_stopwords,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_length BETWEEN 3 AND 10
            AND symbol_word_ratio <= 0.1
            AND bullet_line_frac < 0.9
            AND ellipsis_line_frac < 0.3
            AND alpha_word_frac >= 0.8
            AND n_stopwords >= 2)::INT AS passes
    FROM s2 ORDER BY doc_id
    """,
)
def q_gopher_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality signals (Rae et al. 2021 A1.1)
    — one pure-JVM projection. Bullet / ellipsis / symbol pathologies
    are PLANTED by doc_id%4 so every rule fires on some slice."""
    from .operators.quality_rules import gopher_quality_signals

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"), F.element_at(F.array(
            F.lit(""),
            F.lit("\n- first bullet\n- second bullet"),
            F.lit("\nwait for it...\nmore to come..."),
            F.lit(" ### ### ###"),
        ), (F.col("doc_id") % 4 + 1).cast("int"))),
    )
    return (gopher_quality_signals(docs)
            .withColumn("passes", F.col("passes").cast("int"))
            .orderBy("doc_id"))


@_register(
    "c4_line_cleaning",
    """
    SELECT doc_id,
           'Alpha beta gamma delta epsilon one.' || chr(10) ||
           'Alpha beta gamma delta epsilon two.' || chr(10) ||
           'Alpha beta gamma delta epsilon three.' AS clean_text,
           3 AS n_lines_kept,
           1 AS n_lines_dropped
    FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id
    """,
)
def q_c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line filtering (terminal punctuation, >=5 words, no
    javascript; doc dropped under 3 kept lines or on lorem-ipsum /
    brace). Planted by doc_id%3: slice 0 gains 3 keepable lines,
    slice 1 only 1, slice 2 trips the lorem-ipsum page filter — the
    oracle is the closed-form survivor set."""
    from .operators.quality_rules import c4_line_filter

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"), F.element_at(F.array(
            F.lit("\nAlpha beta gamma delta epsilon one."
                  "\nAlpha beta gamma delta epsilon two."
                  "\nAlpha beta gamma delta epsilon three."),
            F.lit("\nGood line with five words here.\nshort words."),
            F.lit("\nJavascript is required to view. lorem ipsum"),
        ), (F.col("doc_id") % 3 + 1).cast("int"))),
    )
    return c4_line_filter(docs).orderBy("doc_id")


@_register(
    "canonical_url_dedup",
    """
    WITH g AS (
      SELECT doc_id % 210 AS gid, min(doc_id) AS id,
             count(*) AS group_size
      FROM documents GROUP BY 1
    )
    SELECT id,
           'https://'
           || CASE gid % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
              ELSE '' END
           || 'site' || (gid % 5)::VARCHAR
           || CASE gid % 2 WHEN 0 THEN '.com' ELSE '.org' END
           || '/p/' || (gid % 7)::VARCHAR || '?a=1&b=2' AS canon_url,
           group_size
    FROM g ORDER BY id
    """,
)
def q_canonical_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup on the canonical form: tracking params
    (utm_*, fbclid, gclid) stripped, fragment dropped, params sorted.
    Four planted query-string variants per URL must all collapse to
    one canonical key => groups are exactly doc_id % 210 (closed
    form)."""
    from .operators.weblinks import dedup_by_canonical_url

    wu = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(_planted_url(), F.element_at(F.array(
            F.lit("?utm_source=x&b=2&a=1"),
            F.lit("?a=1&b=2&utm_campaign=z"),
            F.lit("?b=2&a=1#frag"),
            F.lit("?a=1&b=2"),
        ), (F.col("doc_id") % 4 + 1).cast("int"))).alias("url"))
    return dedup_by_canonical_url(wu).orderBy("id")


@_register(
    "domain_doc_cap",
    """
    WITH u AS (
      SELECT doc_id,
             'site' || (doc_id % 5)::VARCHAR
             || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END
               AS domain
      FROM documents
    ),
    r AS (
      SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain
                 ORDER BY md5('cap|' || doc_id::VARCHAR)) AS rk
      FROM u
    )
    SELECT doc_id, domain FROM r WHERE rk <= 7 ORDER BY doc_id
    """,
)
def q_domain_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb-style), deterministic by
    hash order so the kept set is stable under re-partitioning and
    resume. One shuffle on domain; oracle replays the identical
    md5-ordered rank."""
    from .operators.weblinks import cap_docs_per_domain

    wu = _docs(spark, sf_dir).select(
        "doc_id", _planted_url().alias("url"))
    return (cap_docs_per_domain(wu, 7)
            .select("doc_id", "domain").orderBy("doc_id"))


@_register(
    "bpe_pair_counts",
    """
    WITH vocab AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(str_split(text, ' ')) AS w FROM documents
      ) WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i::INT, 2))) AS pair,
             c
      FROM vocab
    )
    SELECT pair, sum(c)::BIGINT AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair ASC LIMIT 50
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair statistics: adjacent char-pair
    counts weighted by word frequency, computed over the VOCABULARY
    (Heaps-sublinear), top-n via per-partition heaps."""
    from .operators.corpus_stats import bpe_pair_stats

    return bpe_pair_stats(_docs(spark, sf_dir), top_n=50)


@_register(
    "html_link_graph",
    """
    WITH s AS (
      SELECT doc_id,
             'site' || (doc_id % 5)::VARCHAR
             || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END
               AS src
      FROM documents
    ),
    e AS (
      SELECT src, 'site' || ((doc_id + 1) % 5)::VARCHAR || '.com' AS dst
      FROM s
      UNION ALL
      SELECT src, src FROM s   -- the relative link resolves home
    )
    SELECT src, dst, count(*)::BIGINT AS n_links
    FROM e GROUP BY src, dst ORDER BY src, dst
    """,
)
def q_html_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain link graph extracted from REAL rendered HTML (stdlib
    parser through the Arrow UDF), relative hrefs resolved against
    the page URL. Each planted page links to site{(id+1)%5}.com and
    to itself via a relative path — the oracle replays the closed
    form."""
    from .operators.weblinks import link_graph

    html = F.concat(
        F.lit('<html><body><p>intro text</p><a href="https://site'),
        ((F.col("doc_id") + 1) % 5).cast("string"),
        F.lit('.com/x">out</a><a href="/rel/p">home</a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        "doc_id", _planted_url().alias("url"), html.alias("html"))
    return link_graph(pages).orderBy("src", "dst")


@_register(
    "anchor_text_mining",
    """
    WITH b AS (
      SELECT doc_id,
             'https://'
             || CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
                ELSE '' END
             || 'site' || (doc_id % 5)::VARCHAR
             || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.org' END
               AS origin,
             ((doc_id + 1) % 5)::VARCHAR AS k
      FROM documents
    )
    SELECT doc_id, target, anchor FROM (
      SELECT doc_id, 'https://site' || k || '.com/x' AS target,
             'go to site ' || k AS anchor, 0 AS ord
      FROM b
      UNION ALL
      SELECT doc_id, origin || '/rel/p', 'home page', 1 FROM b
    ) ORDER BY doc_id, ord
    """,
)
def q_anchor_text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, target url, anchor text) pairs from REAL rendered HTML —
    the retrieval weak-supervision signal. Each planted page carries
    an absolute link with a known anchor and a relative link ('home
    page') that must resolve against the page's own origin; the
    oracle replays the closed form."""
    from .operators.weblinks import anchor_text_pairs

    k = ((F.col("doc_id") + 1) % 5).cast("string")
    html = F.concat(
        F.lit('<html><body><p>intro</p><a href="https://site'), k,
        F.lit('.com/x">go to <b>site</b> '), k,
        F.lit('</a> and <a href="/rel/p"> home\n page </a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        "doc_id", _planted_url().alias("url"), html.alias("html"))
    return anchor_text_pairs(pages).orderBy("doc_id", "target")


@_register(
    "corpus_version_diff",
    """
    SELECT id, status FROM (
      SELECT doc_id AS id,
             CASE WHEN doc_id % 7 = 0 THEN 'removed'
                  WHEN doc_id % 5 = 1 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, 'added'
      FROM documents WHERE doc_id % 11 = 0
    ) ORDER BY id
    """,
)
def q_corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release audit: content-hash diff between two corpus
    versions (added/removed/changed/unchanged). The new version is
    PLANTED from the old by doc_id arithmetic (drop %7, edit %5,
    append %11 under new ids), so the oracle is the closed-form
    status map while Spark runs the real two-sided hash join."""
    from .operators.corpus_stats import corpus_diff

    old = _docs(spark, sf_dir)
    new = old.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 1,
               F.concat(F.col("text"), F.lit(" [edited]")))
        .otherwise(F.col("text")),
    ).unionByName(
        old.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" [new]")).alias("text"),
            *[c for c in old.columns if c not in ("doc_id", "text")])
        .select(old.columns)
    )
    return corpus_diff(old, new).orderBy("id")


@_register(
    "pdf_page_furniture_strip",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 300
    ),
    m AS (
      SELECT doc_id, ws, cast(ceil(len(ws) / 3.0) AS INT) AS m FROM d
    )
    SELECT doc_id::VARCHAR AS doc_id,
           'alpha ' || array_to_string(ws[1 : m], ' ') || chr(10) ||
           'beta '  || array_to_string(ws[m+1 : 2*m], ' ') || chr(10) ||
           'gamma ' || array_to_string(ws[2*m+1 : 3*m], ' ')
             AS extracted
    FROM m ORDER BY doc_id
    """,
)
def q_pdf_page_furniture_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real round trip: 3-page PDFs with planted running headers
    ('Synthetic Journal') and page-number footers ('Page k') → parser
    → positional repeated-line furniture strip → ONLY the per-page
    body lines survive (closed-form oracle). The body of page k is
    the k-th third of the words, marked alpha/beta/gamma so pages are
    never spuriously identical."""
    import pandas as pd

    from .functions.pdf_text import make_simple_pdf
    from .sources.pdf_ingest import pdf_to_spans

    docs = _docs(spark, sf_dir).where("doc_id < 300").select(
        "doc_id", "text")

    def build(batches):
        markers = ("alpha", "beta", "gamma")
        for pdf in batches:
            blobs = []
            for t in pdf["text"]:
                ws = t.split(" ")
                m = -(-len(ws) // 3)
                pages = [
                    ["Synthetic Journal",
                     f"{markers[k]} " + " ".join(ws[k * m:(k + 1) * m]),
                     f"Page {k + 1}"]
                    for k in range(3)
                ]
                blobs.append(make_simple_pdf(pages))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype(str), "pdf": blobs})

    pdfs = docs.mapInPandas(build, "doc_id string, pdf binary")
    spans = pdf_to_spans(pdfs, strip_furniture=True)
    text = F.expr(
        "array_join(transform(array_sort(filter(spans, s -> s.kind = 'text'),"
        " (a, b) -> a.offset - b.offset), s -> s.text), '\\n')"
    )
    return spans.select("doc_id", text.alias("extracted")).orderBy("doc_id")


@_register(
    "inverted_index_postings",
    """
    WITH t AS (
      SELECT DISTINCT doc_id AS id, w AS term FROM (
        SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
      ) WHERE w <> ''
    ),
    r AS (
      SELECT term, id,
             row_number() OVER (PARTITION BY term ORDER BY id) AS rk,
             count(*) OVER (PARTITION BY term) AS n
      FROM t
    )
    SELECT term, any_value(n)::BIGINT AS n_docs,
           string_agg(CASE WHEN rk <= 20 THEN id::VARCHAR END,
                      ',' ORDER BY id) AS postings
    FROM r GROUP BY term ORDER BY term
    """,
)
def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with BOUNDED posting lists (cap 20, so the
    synthetic stopword-like vocabulary exercises visible truncation:
    n_docs stays the true document frequency)."""
    from .operators.search import inverted_index

    return inverted_index(_docs(spark, sf_dir),
                          max_postings=20).orderBy("term")


@_register(
    "bm25_topk_search",
    """
    WITH w AS (
      SELECT doc_id AS id, w AS term FROM (
        SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
      ) WHERE w <> ''
    ),
    dl AS (SELECT id, count(*) AS dl FROM w GROUP BY id),
    s AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT id, term, count(*) AS tf FROM w
           WHERE term IN ('customer', 'query', 'fast')
           GROUP BY id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    p AS (
      SELECT tf.id,
             ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
               AS sc
      FROM tf JOIN dfq USING (term) JOIN dl USING (id) CROSS JOIN s
    )
    SELECT id AS doc_id, round(sum(sc), 6) AS score
    FROM p GROUP BY id ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def q_bm25_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75, Robertson idf) for a
    3-term query — the corpus-side search primitive for contamination
    review and topical slicing. The oracle replays the exact formula;
    top-k is per-partition heaps."""
    from .operators.search import bm25_search

    return bm25_search(_docs(spark, sf_dir),
                       ["customer", "query", "fast"], k=20)


@_register(
    "token_budget_mixture",
    """
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(str_split(text, ' '), w -> w <> ''))
               AS n_tokens,
             md5('mix|' || doc_id::VARCHAR) AS ord
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t
    )
    SELECT doc_id, lang, n_tokens FROM c
    WHERE cum <= CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1200
                 WHEN 'fr' THEN 600 END
    ORDER BY doc_id
    """,
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction by TOKEN budget per language stratum
    (en 3000 / de 1200 / fr 600 tokens; other strata dropped) —
    deterministic hash order, stratum-partitioned running sum, stable
    under repartitioning. The oracle replays the identical window."""
    from .operators.sampling import sample_tokens_per_stratum

    return (
        sample_tokens_per_stratum(
            _docs(spark, sf_dir).select("doc_id", "lang", "text"),
            {"en": 3000, "de": 1200, "fr": 600})
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


@_register(
    "packed_training_sequences",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> w <> '') AS ws,
             md5('pack|' || doc_id::VARCHAR) AS k
      FROM documents
    ),
    t2 AS (SELECT *, len(ws) AS nt FROM t WHERE len(ws) > 0),
    o AS (
      SELECT doc_id, ws, nt, k,
             coalesce(sum(nt) OVER (ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start
      FROM t2
    ),
    p AS (
      SELECT u.win AS win, o.start,
             greatest(u.win * 512, o.start) - o.start AS a,
             least((u.win + 1) * 512, o.start + o.nt) - o.start AS b,
             o.ws
      FROM o, UNNEST(range((o.start // 512)::BIGINT,
                           ((o.start + o.nt - 1) // 512 + 1)::BIGINT))
               AS u(win)
    )
    SELECT win AS seq_id,
           count(*)::BIGINT AS n_docs,
           sum(b - a)::BIGINT AS n_tokens,
           string_agg(array_to_string(ws[a+1 : b], ' '),
                      ' ' ORDER BY start) AS seq_text,
           (sum(b - a) = 512)::INT AS complete
    FROM p GROUP BY win ORDER BY seq_id
    """,
)
def q_packed_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 512-token training sequences:
    deterministic hash order, two-pass partitioned prefix sum (no
    global sort), one shuffle by window id. The oracle replays the
    identical ordering/slicing with a plain SQL window."""
    from .operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), 512).orderBy("seq_id")


# The clean suffix and its UTF-8-read-as-Latin-1 corruption, computed
# (not source literals — the corrupted form contains control chars).
_MOJI_GOOD = " café “ok” fin"
_MOJI_BAD = _MOJI_GOOD.encode("utf-8").decode("latin-1")


@_register(
    "mojibake_repair",
    f"""
    SELECT doc_id,
           text || CASE WHEN doc_id % 2 = 0
                        THEN '{_MOJI_GOOD}' ELSE '' END AS text,
           (doc_id % 2 = 0)::INT AS repaired
    FROM documents ORDER BY doc_id
    """,
)
def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-style double-decode repair: half the corpus gains a
    PLANTED UTF-8-as-Latin-1 corrupted suffix; fix_mojibake must
    invert it exactly (guarded encode/decode round trip, pure JVM)
    while leaving clean documents byte-identical — the oracle states
    the repaired text in closed form."""
    from .operators.text_metrics import fix_mojibake

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(_MOJI_BAD)))
        .otherwise(F.col("text")))
    return (fix_mojibake(docs)
            .select("doc_id", "text", "repaired").orderBy("doc_id"))


@_register(
    "inter_event_gaps",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap_us
      FROM events
    )
    SELECT user_id,
           count(gap_us)::BIGINT AS n_gaps,
           round(avg(gap_us / 1e6), 6) AS avg_gap_sec,
           round(max(gap_us / 1e6), 6) AS max_gap_sec
    FROM g GROUP BY user_id
    HAVING count(gap_us) > 0
    ORDER BY user_id
    """,
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via lag() over the user's
    event-time order (event_id tie-break) — one shuffle on user_id,
    the window and the aggregate share it. TIMESTAMP_NTZ diffs via
    unix_micros (the cast-to-double trap)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"))
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = ev.withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
    return (
        gaps.groupBy("user_id")
        .agg(F.count("_gap").cast("long").alias("n_gaps"),
             F.round(F.avg(F.col("_gap") / 1e6), 6).alias("avg_gap_sec"),
             F.round(F.max(F.col("_gap") / 1e6), 6).alias("max_gap_sec"))
        .where(F.col("n_gaps") > 0)
        .orderBy("user_id")
    )


@_register(
    "purchase_value_medians",
    """
    SELECT user_id,
           count(*)::BIGINT AS n_purchases,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING count(*) >= 3 ORDER BY user_id
    """,
)
def q_purchase_value_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group medians/percentiles (Spark percentile ==
    DuckDB quantile_cont, linear interpolation) — grouped aggregation,
    map-side partial, never a global sort."""
    ev = _events(spark, sf_dir).where("event_type = 'purchase'")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_purchases"),
             F.round(F.percentile("value", F.lit(0.5)), 6)
             .alias("median_value"),
             F.round(F.percentile("value", F.lit(0.9)), 6)
             .alias("p90_value"))
        .where(F.col("n_purchases") >= 3)
        .orderBy("user_id")
    )


@_register(
    "event_transition_matrix",
    """
    WITH s AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (
      SELECT src, dst, count(*) AS n FROM s
      WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n::BIGINT AS n,
           round(n / sum(n) OVER (PARTITION BY src), 6) AS p
    FROM c ORDER BY src, dst
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (behavior-model prep): lead() over the user partition,
    pair counts, row-normalized probabilities. The normalizing window
    partitions by src (bounded type vocabulary — never
    SinglePartition over data-scale rows)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"))
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    pairs = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .where(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )
    norm = Window.partitionBy("src")
    return (
        pairs.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(norm), 6))
        .orderBy("src", "dst")
    )


@_register(
    "registrable_domain_keying",
    """
    WITH u AS (
      SELECT doc_id, n_chars,
             CASE doc_id % 5
               WHEN 0 THEN 'shop' || (doc_id % 4)::VARCHAR || '.co.uk'
               WHEN 1 THEN 'www.news' || (doc_id % 4)::VARCHAR || '.com.au'
               WHEN 2 THEN 'docs' || (doc_id % 4)::VARCHAR || '.github.io'
               WHEN 3 THEN 'cdn.assets' || (doc_id % 4)::VARCHAR
                           || '.s3.amazonaws.com'
               ELSE 'www.plain' || (doc_id % 4)::VARCHAR || '.com'
             END AS host,
             CASE doc_id % 5
               WHEN 0 THEN 'shop' || (doc_id % 4)::VARCHAR || '.co.uk'
               WHEN 1 THEN 'news' || (doc_id % 4)::VARCHAR || '.com.au'
               WHEN 2 THEN 'docs' || (doc_id % 4)::VARCHAR || '.github.io'
               WHEN 3 THEN 'assets' || (doc_id % 4)::VARCHAR
                           || '.s3.amazonaws.com'
               ELSE 'plain' || (doc_id % 4)::VARCHAR || '.com'
             END AS domain
      FROM documents
    )
    SELECT domain,
           count(*) AS n_docs,
           count(DISTINCT host) AS n_hosts,
           round(avg(1.0), 6) AS avg_path_depth,
           round(avg(n_chars), 6) AS avg_chars
    FROM u GROUP BY domain ORDER BY domain
    """,
)
def q_registrable_domain_keying(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix-aware domain keying (VERDICT r5 #4): hosts under
    multi-label registries (`co.uk`, `com.au`), hosted platforms from
    the PSL private section (`github.io`), and a three-label suffix
    (`s3.amazonaws.com`) must each key by registrar-level site — the
    naive last-two-labels rule would collapse every `*.co.uk` site
    into one 'co.uk' domain. Spark runs the real regexp parser + InSet
    suffix lookup; the oracle states the registrable domain in closed
    form per planted host class."""
    from .operators.weblinks import domain_stats

    host = F.concat(
        F.element_at(
            F.array(F.lit("shop"), F.lit("www.news"), F.lit("docs"),
                    F.lit("cdn.assets"), F.lit("www.plain")),
            (F.col("doc_id") % 5 + 1).cast("int")),
        (F.col("doc_id") % 4).cast("string"),
        F.element_at(
            F.array(F.lit(".co.uk"), F.lit(".com.au"), F.lit(".github.io"),
                    F.lit(".s3.amazonaws.com"), F.lit(".com")),
            (F.col("doc_id") % 5 + 1).cast("int")),
    )
    wu = _docs(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("https://"), host, F.lit("/page")))
    return domain_stats(wu).orderBy("domain")


# --------------------------------------------------------------------------
# Driver-evidence scheduling.
#
# The correctness harness records a bounded prefix (~50 entries) of
# this registry per round, in insertion order; with 70+ registered
# queries, a static order would leave the tail permanently without a
# driver-recorded row. Rotate the queries that have never (or least
# recently) appeared in a driver CORRECTNESS_r*.json to the FRONT so
# every operator accumulates hard driver evidence across rounds. The
# full battery is still verified every round by tools/check_oracles.py
# regardless of position.
# --------------------------------------------------------------------------

def _driver_staleness_order() -> list:
    """Order queries by how badly they need fresh driver evidence:

    1. queries whose LATEST driver check failed (need a green row ASAP),
    2. then by the round of their latest driver check, oldest first
       (never-checked queries sort as round 0, i.e. to the front),
    3. registration order as the deterministic tie-break.

    Evidence is read from the committed ``CORRECTNESS_r*.json`` files at
    the repo root, so the rotation maintains itself — a new query or a
    stale one surfaces automatically instead of via a hand-curated list
    (VERDICT r4 #4).
    """
    import json
    import re
    from pathlib import Path

    latest: dict = {}  # name -> (round, passed)
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        for name, v in rows.items():
            if name in latest and latest[name][0] >= rnd:
                continue
            if isinstance(v, dict):
                ok = (bool(v.get("rows_match"))
                      and v.get("schema_match") is not False
                      and v.get("hash_match") is not False
                      and not v.get("err"))
            else:
                ok = False
            latest[name] = (rnd, ok)

    reg_idx = {n: i for i, n in enumerate(QUERIES)}

    def key(name):
        rnd, ok = latest.get(name, (0, True))
        return (0 if (name in latest and not ok) else 1, rnd, reg_idx[name])

    return sorted(QUERIES, key=key)


#: Immutable registration order, captured BEFORE the driver staleness
#: rotation below reorders ``QUERIES``. bench.py times the battery in
#: this order so per-query times are comparable round-over-round —
#: otherwise each round a different battery head eats the JVM/worker
#: cold start and shows up as a phantom regression (VERDICT r5 #1).
REGISTRATION_ORDER = tuple(QUERIES)


def _schedule_for_driver() -> None:
    for n in _driver_staleness_order():
        QUERIES[n] = QUERIES.pop(n)
        if n in ORACLES:
            ORACLES[n] = ORACLES.pop(n)


_schedule_for_driver()
