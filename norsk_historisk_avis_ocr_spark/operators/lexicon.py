"""Corpus-driven lexicon induction for the orthography confusion table.

The reference's correction prompt fixes the confusion *rule classes*
(``engines/_correction.py:21-27``: rn→m, li→h, cl→d, ø/æ/å confusions) but
leaves the *word list* they apply to implicit — it is whatever the LLM
knows. The Spark-native analog derives that word list from the corpus
itself: a token-frequency scan keeps the top-N alphabetic tokens (the words
the corpus actually prints, which are exactly the words OCR misreadings
corrupt), and :func:`~..stages.normalize.build_confusion_table` expands them
into misreading→word rewrites.

Scale shape (10^12 rows): one explode + one groupBy shuffle on the token —
the classic word-count plan with map-side partial aggregation; the top-N
cut is ``TakeOrderedAndProject`` (no global sort), and only N rows (a few
hundred) ever reach the driver — the same bounded-k broadcast-model shape
as ``operators/kmeans.py``. The induced table is then broadcast back to
executors through the normal ``to_table()`` path.

Token semantics intentionally mirror ``OrthographyNormalizer``'s core
extraction (whitespace split, edge-punctuation strip, lowercase) so every
induced lexicon word is reachable by the normalizer's own lookup.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..stages.normalize import (
    DEFAULT_PRESERVE, DEFAULT_TABLE, _PUNCT, OrthographyNormalizer,
    build_confusion_table,
)

# Regex character class matching the normalizer's _PUNCT edge strip.
# `-` is escaped; the unicode dashes/guillemets are literal class members in
# both Java regex (Spark) and RE2 (DuckDB), so the oracle can share it.
_PUNCT_CLASS = "[" + re.escape(_PUNCT) + "]"

# Whitespace class matching Python's str-mode \s (the normalizer's
# _WS_SPLIT) across Java regex AND RE2: both engines' bare \s is
# ASCII-only (RE2's even lacks \x0b), so the unicode spaces Python splits
# on — NBSP, ogham, en/em spaces, line/para separators, NNBSP, MMSP,
# ideographic — are listed explicitly. (Python additionally treats the
# \x1c-\x1f file separators as whitespace; those are left out — both
# engines here agree with each other, which is what the oracle needs.)
_EXTRA_WS = ("\u000b\u0085\u00a0\u1680\u2000-\u200a"
             "\u2028\u2029\u202f\u205f\u3000")
_WS_CLASS = "[\\s" + _EXTRA_WS + "]"

# A lexicon word is a run of lowercase Norwegian letters. (Digits, mixed
# scripts, and leftover markup never belong in a confusion lexicon.)
_WORD_RE = "^[a-zæøå]+$"


def token_core(col) -> F.Column:
    """Lowercased token with edge punctuation stripped — the column-algebra
    twin of ``OrthographyNormalizer``'s ``tok.strip(_PUNCT).lower()``."""
    core = F.lower(col)
    core = F.regexp_replace(core, f"^{_PUNCT_CLASS}+", "")
    return F.regexp_replace(core, f"{_PUNCT_CLASS}+$", "")


def token_frequencies(docs: DataFrame, text_col: str = "text",
                      min_len: int = 3) -> DataFrame:
    """(token, cnt) over the whole corpus: whitespace tokens, edge
    punctuation stripped, lowercased, alphabetic-only, length ≥ ``min_len``.

    One shuffle (the groupBy), partial-aggregated map-side; everything
    before it is a Project — scan-speed at any corpus size.
    """
    tok = F.explode(F.split(F.col(text_col), _WS_CLASS + "+")).alias("tok")
    cores = docs.select(tok).select(token_core(F.col("tok")).alias("token"))
    return (cores
            .filter(F.col("token").rlike(_WORD_RE)
                    & (F.length("token") >= min_len))
            .groupBy("token").agg(F.count("*").alias("cnt")))


def corpus_lexicon(docs: DataFrame, text_col: str = "text",
                   top_n: int = 500, min_len: int = 3,
                   min_count: int = 2) -> list[str]:
    """Top-``top_n`` corpus tokens as an induced lexicon (deterministic
    tie-break: count desc, then token asc). Driver traffic is exactly
    ``top_n`` short strings — a bounded-k collect, not a data collect."""
    freq = token_frequencies(docs, text_col, min_len=min_len)
    rows = (freq.filter(F.col("cnt") >= min_count)
                .orderBy(F.desc("cnt"), F.asc("token"))
                .limit(top_n).collect())
    return [r["token"] for r in rows]


def normalizer_from_corpus(docs: DataFrame, text_col: str = "text",
                           top_n: int = 500, min_count: int = 2,
                           vocab_n: int = 20000,
                           extra_table: dict[str, str] | None = None,
                           preserve: frozenset[str] = DEFAULT_PRESERVE,
                           ) -> OrthographyNormalizer:
    """End-to-end induction: corpus → frequency lexicon → confusion table →
    normalizer. Hand-curated entries (``extra_table``, default the
    reference-derived ``DEFAULT_TABLE``) win over generated ones, and
    preserved 1950s forms are never rewrite *sources* (the normalizer checks
    the preserve set before any trie walk).

    The top ``vocab_n`` corpus tokens (one collect serves both lists) veto
    confusion variants that are themselves real words: a variant of a
    frequent word can be a legitimate rarer word (``kom`` → variant
    ``korn``), and without the veto every occurrence of it would be
    rewritten corpus-wide."""
    freq = token_frequencies(docs, text_col)
    rows = (freq.filter(F.col("cnt") >= min_count)
                .orderBy(F.desc("cnt"), F.asc("token"))
                .limit(max(vocab_n, top_n)).collect())
    toks = [r["token"] for r in rows]
    table = build_confusion_table(toks[:top_n], vocab=set(toks))
    table.update(DEFAULT_TABLE if extra_table is None else extra_table)
    return OrthographyNormalizer(table, preserve)
