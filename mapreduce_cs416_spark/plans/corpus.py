"""Corpus queries — the reference's shipped applications (SURVEY.md §2.B)
re-expressed over the `documents` table (one row = one input file,
FIXTURES.md).

Where the reference runs sort-based full-group reduces
(mr/worker.go:156-177), these use Spark's hash aggregation with
partial (map-side) combine — semantically identical on these
queries, strictly better at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import WORD_SPLIT_RE
from ..operators.mapreduce import mr_output_lines, run_mapreduce
from ..sources.tables import load_table
from .spec import QuerySpec

# DuckDB twin of the tokenizer (RE2 \p{L} == Java \p{L} on this corpus)
_SQL_WORDS = "regexp_split_to_array(text, '[^\\p{L}]+')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- wordcount
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 word count (mrapps/wc.go:19-40): tokenize on runs of
    non-letters, count occurrences per word.

    Plan shape: parquet scan (text column only — pruned) → split →
    explode → filter → partial hash-agg → shuffle on word → final
    hash-agg. One shuffle; the explode and both agg sides stay in
    whole-stage codegen.
    """
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", WORD_SPLIT_RE)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORDCOUNT_SQL = f"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest({_SQL_WORDS}) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


# ----------------------------------------------------------- inverted index
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 inverted index (mrapps/indexer.go:20-39): per-document
    *distinct* words (map-side set dedup, indexer.go:21-25), then per
    word: document count and the sorted comma-joined document list
    (indexer.go:37-38).

    distinct() before the aggregate reproduces the map-side dedup —
    which is itself the partial-aggregation trick — and keeps the
    collect_set group sizes bounded by the doc count per word.
    """
    pairs = (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id").cast("string").alias("doc"),
            F.explode(F.split("text", WORD_SPLIT_RE)).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )
    return pairs.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.sort_array(F.collect_set("doc")), ",").alias("docs"),
    )


INVERTED_INDEX_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc, word
    FROM (SELECT doc_id, unnest({_SQL_WORDS}) AS word FROM documents)
    WHERE word <> ''
)
SELECT word, count(*) AS n_docs, string_agg(doc, ',' ORDER BY doc) AS docs
FROM pairs
GROUP BY word
"""


def inverted_index_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inverted_index through two-level salted aggregation — the plan a
    hot word (stopwords index millions of docs) needs at 100 TB: salt
    on the doc id splits each word's posting list across tasks; the
    salted partials are disjoint doc sets, so the final merge is
    flatten + sort, never a re-dedup. Same oracle as inverted_index."""
    pairs = (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id").cast("string").alias("doc"),
            F.explode(F.split("text", WORD_SPLIT_RE)).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
        .withColumn("salt", F.pmod(F.xxhash64("doc"), F.lit(16)))
    )
    partial = pairs.groupBy("word", "salt").agg(
        F.count("*").alias("n_part"),
        F.sort_array(F.collect_set("doc")).alias("docs_part"),
    )
    return partial.groupBy("word").agg(
        F.sum("n_part").alias("n_docs"),
        F.array_join(F.array_sort(F.flatten(F.collect_list("docs_part"))), ",").alias("docs"),
    )


# -------------------------------------------------- crash/nocrash emit shape
def file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4/B5 crash & nocrash query shape (mrapps/crash.go:34-55,
    mrapps/nocrash.go:17-47): map emits four KVs per file —
    a=filename, b=len(filename), c=len(contents), d="xyzzy" — and
    reduce sorts each key's values and space-joins them
    (crash.go:48-54; the in-reduce sort is how the reference makes
    shuffle order deterministic, SURVEY.md §1.2#3).
    """
    kv = _docs(spark, sf_dir).selectExpr(
        "stack(4, "
        "  'a', CAST(doc_id AS STRING), "
        "  'b', CAST(length(CAST(doc_id AS STRING)) AS STRING), "
        "  'c', CAST(length(text) AS STRING), "
        "  'd', 'xyzzy'"
        ") AS (key, value)"
    )
    return kv.groupBy("key").agg(
        F.array_join(F.sort_array(F.collect_list("value")), " ").alias("agg_values")
    )


FILE_STATS_SQL = """
WITH kv AS (
    SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
    UNION ALL
    SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'd', 'xyzzy' FROM documents
)
SELECT key, string_agg(value, ' ' ORDER BY value) AS agg_values
FROM kv
GROUP BY key
"""


def file_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """file_stats through the salted two-level holistic aggregate
    (operators/skew.py) — same oracle as the direct version; this is
    the plan a hot key gets at 100 TB (the 'd'→'xyzzy' key here IS
    maximally skewed: every row lands on it)."""
    from ..operators.skew import salted_holistic_agg

    kv = _docs(spark, sf_dir).selectExpr(
        "stack(4, "
        "  'a', CAST(doc_id AS STRING), "
        "  'b', CAST(length(CAST(doc_id AS STRING)) AS STRING), "
        "  'c', CAST(length(text) AS STRING), "
        "  'd', 'xyzzy'"
        ") AS (key, value)"
    )
    return salted_holistic_agg(kv, n_salts=16)


# ------------------------------------------------------------ early_exit app
def file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 early_exit query shape (mrapps/early_exit.go:19-36): one
    ("filename", "1") per file, counted per key."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.col("doc_id").cast("string").alias("doc"))
        .agg(F.count("*").alias("cnt"))
    )


FILE_COUNT_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc, count(*) AS cnt
FROM documents
GROUP BY 1
"""


# ------------------------------------------------------- text sink formatting
def mr_text_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 text sink: '"%v %v\\n"' per reduced key (mr/worker.go:175,
    format rule README.md:195) applied to the *compat-engine* word
    count (run_mapreduce with the literal mrapps/wc.go plugins), so
    one driver row verifies the whole reference pipeline end-to-end:
    user map/reduce plugins (A2/A7/A15) → sorted-union contract (A6,
    README.md:119-127) → text sink (A8). The idiomatic wordcount twin
    is driver-verified separately; mr_wordcount_compat stays
    pytest-verified in EXTRA_QUERIES against the same oracle."""
    wc = mr_wordcount_compat(spark, sf_dir).select(
        F.col("word").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    return mr_output_lines(wc)


MR_TEXT_OUTPUT_SQL = f"""
SELECT word || ' ' || CAST(cnt AS VARCHAR) AS line
FROM ({WORDCOUNT_SQL})
"""


# -------------------------------------------------- compat surface end-to-end
def _wc_plugins():
    """The literal map/reduce callables of mrapps/wc.go:19-40 as
    Python (category-L tokenization == unicode.IsLetter == \\p{L})."""
    from ..functions.text import py_letter_tokens

    def mapf(filename: str, contents: str):
        # mrapps/wc.go:19-32 — emit (word, "1") per occurrence
        return [(w, "1") for w in py_letter_tokens(contents)]

    def reducef(key: str, values: list[str]) -> str:
        # mrapps/wc.go:37-40 — strconv.Itoa(len(values))
        return str(len(values))

    return mapf, reducef


def _mr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("filename"), F.col("text").alias("contents")
    )


def mr_wordcount_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 executed through the run_mapreduce() compatibility surface:
    the *literal* map/reduce callables of mrapps/wc.go:19-40 as Python,
    over (filename, contents) records — proving arbitrary user plugins
    run unchanged (A2/A7/A15). Output cast to match the idiomatic
    wordcount so the same oracle covers both paths."""
    mapf, reducef = _wc_plugins()
    out = run_mapreduce(_mr_docs(spark, sf_dir), mapf, reducef, n_partitions=10)
    return out.select(F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt"))


def mr_wordcount_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME wc.go plugins through run_mapreduce_arrow — identical
    plugin contract, Arrow-batched transport (mapInPandas +
    applyInPandas) instead of pickled RDD rows: the scale path for
    user callables. Shares the wordcount oracle with both twins."""
    from ..operators.mapreduce import run_mapreduce_arrow

    mapf, reducef = _wc_plugins()
    out = run_mapreduce_arrow(_mr_docs(spark, sf_dir), mapf, reducef)
    return out.select(F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt"))


QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        QuerySpec("wordcount", wordcount, WORDCOUNT_SQL, wordcount.__doc__, headline=True, tags=("reference", "B1")),
        QuerySpec("inverted_index", inverted_index, INVERTED_INDEX_SQL, inverted_index.__doc__, headline=True, tags=("reference", "B2")),
        QuerySpec("file_stats", file_stats, FILE_STATS_SQL, file_stats.__doc__, tags=("reference", "B4", "B5")),
        # file_count (B8 early_exit) rotated to EXTRA in r8 — trivial
        # one-file count, oracle kept and parity-checked every pytest
        # run; the slot lets the driver hash a new r8 family.
        QuerySpec("mr_text_output", mr_text_output, MR_TEXT_OUTPUT_SQL, mr_text_output.__doc__, tags=("reference", "A8")),
    ]
}

# Twins sharing an already-driver-verified oracle: the salted twins
# (same oracles as their unsalted driver rows — the skew family's
# driver presence is the salting itself, not a second oracle) and the
# run_mapreduce compat wordcount (same oracle as wordcount; the compat
# engine itself is still driver-verified through mr_text_output, which
# runs the same run_mapreduce path plus the A8 text sink). Verified
# every CI run by tests/test_parity.py. file_stats_salted rotated here
# in round 4 to free a driver slot for dedup_components.
EXTRA_QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        QuerySpec("inverted_index_salted", inverted_index_salted, INVERTED_INDEX_SQL, inverted_index_salted.__doc__, tags=("reference", "B2", "skew")),
        QuerySpec("file_stats_salted", file_stats_salted, FILE_STATS_SQL, file_stats_salted.__doc__, tags=("reference", "B4", "B5", "skew")),
        QuerySpec("mr_wordcount_compat", mr_wordcount_compat, WORDCOUNT_SQL, mr_wordcount_compat.__doc__, tags=("reference", "compat", "A15")),
        QuerySpec("mr_wordcount_arrow", mr_wordcount_arrow, WORDCOUNT_SQL, mr_wordcount_arrow.__doc__, tags=("reference", "compat", "A15", "arrow")),
        QuerySpec("file_count", file_count, FILE_COUNT_SQL, file_count.__doc__, tags=("reference", "B8")),
    ]
}
