"""Text-analysis operators over a documents-shaped table: language-ID,
quality scoring, token counting, fingerprinting.

All native Column expressions (whole-stage codegen, no Python in the hot
path); each has an exact ANSI-SQL oracle in ``__spark_entry__.py``. These are
the corpus-hygiene stages a 100 TB training-data pipeline runs between
extraction and dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textqual import (
    STOPWORDS, bpe_ish_token_count, fingerprint, portable_hash60,
    quality_score, token_count, tokens,
)


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Composite quality in [0,1] + its components."""
    n = F.length("text")
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-zÆØÅæøå]", ""))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars_computed"),
        F.round(alpha / F.greatest(n, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language classifier: explode tokens, join the
    (lang, word) marker table (broadcast — it is tiny), count hits per
    (doc, lang), keep the top language (ties → lexicographic lang).

    Documents with zero marker hits get lang 'und'.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        "cand_lang string, word string")

    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word"))
    hits = toks.join(F.broadcast(markers), "word") \
        .groupBy("doc_id", "cand_lang").agg(F.count("*").alias("hits"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang").asc())
    best = hits.withColumn("rn", F.row_number().over(w)) \
        .filter("rn = 1").select("doc_id", "cand_lang", "hits")
    return docs.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cand_lang", F.lit("und")).alias("pred_lang"),
        F.coalesce("hits", F.lit(0)).alias("marker_hits"),
    )


def fingerprints(docs: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-style min-hash fingerprint over k-char shingles (the
    rolling-hash document signature)."""
    return docs.select(
        "doc_id", fingerprint(F.col("text"), k).alias("fp"))


def stopword_ratios(docs: DataFrame) -> DataFrame:
    """Per-document English stopword ratio (quality heuristic component)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    toks = tokens(F.lower(F.col("text")))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return docs.select(
        "doc_id",
        F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)
         .alias("en_stopword_ratio"))
