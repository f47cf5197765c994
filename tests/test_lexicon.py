"""Corpus-driven lexicon induction (operators/lexicon.py)."""

from norsk_historisk_avis_ocr_spark.operators.lexicon import (
    corpus_lexicon, normalizer_from_corpus, token_core, token_frequencies,
)
from norsk_historisk_avis_ocr_spark.stages.normalize import _PUNCT


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_core_matches_normalizer_strip(spark):
    """The column-algebra core must equal tok.strip(_PUNCT).lower() — the
    normalizer's own core extraction — token for token."""
    toks = ["«Mann»", "(kommer)", "hus...", "—båt—", "a", "..", "ÆRLIG!",
            "[så]", "mjølk,", "'høst'", "123", "semi;colon", "x-y"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = [r["core"] for r in
           df.select(token_core(df["tok"]).alias("core")).collect()]
    want = [t.strip(_PUNCT).lower() for t in toks]
    assert got == want


def test_token_frequencies_counts_and_filters(spark):
    df = _docs(spark, [
        "Mann mann «mann» båt.",   # mann ×3 (case/punct collapse), båt ×1
        "båt og mann, og 123 ab",  # 'og' ×2 (len 2: filtered), 123/ab out
    ])
    freq = {r["token"]: r["cnt"]
            for r in token_frequencies(df).collect()}
    assert freq == {"mann": 4, "båt": 2}


def test_corpus_lexicon_deterministic_tiebreak(spark):
    df = _docs(spark, ["ccc bbb aaa", "bbb aaa ccc", "ddd ddd ddd"])
    # counts: ddd=3, aaa=bbb=ccc=2 → tie broken token-asc
    lex = corpus_lexicon(df, top_n=3, min_count=1)
    assert lex == ["ddd", "aaa", "bbb"]
    assert corpus_lexicon(df, top_n=3, min_count=1) == lex  # stable


def test_normalizer_from_corpus_learns_confusions(spark):
    # 'kommer' is frequent in the corpus → the rn→m misreading 'kornmer'
    # must normalize back to it without any hand-curated entry
    df = _docs(spark, ["kommer kommer kommer hver dag",
                       "kommer toget kommer det"])
    nz = normalizer_from_corpus(df, top_n=10, min_count=2, extra_table={})
    assert nz.normalize("Kornmer toget?") == "Kommer toget?"
    # preserved 1950s forms are never rewritten even if corpus-adjacent
    assert nz.normalize("hvad nu") == "hvad nu"


def test_normalizer_from_corpus_explicit_entries_win(spark):
    # hand-curated table overrides a generated mapping for the same variant
    df = _docs(spark, ["mann mann mann"])
    nz = normalizer_from_corpus(
        df, top_n=5, min_count=1, extra_table={"rnann": "menn"})
    assert nz.normalize("rnann") == "menn"


def test_prepare_corpus_induced_lexicon_cli(spark, tmp_path):
    """--induce-lexicon end to end: the job learns 'kommer' from the
    corpus and rewrites the planted rn-misreading before packing."""
    from jobs.prepare_corpus import main

    base = ("kommer og det som på av ikke å jeg toget kommer hver dag "
            "og kommer det som venter på av ikke å jeg")
    rows = [(i, base, "s0") for i in range(8)]
    rows.append((99, base + " kornmer til slutt", "s0"))
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string").write.parquet(inp)

    main(["--input", inp, "--output", out, "--langs", "no",
          "--min-quality", "0.0", "--budget", "64",
          "--induce-lexicon", "20"])

    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(out).collect()}
    assert "kornmer" not in got[99] and "kommer til slutt" in got[99]
    assert got[0] == base  # already-clean text passes through unchanged


def test_token_frequencies_unicode_whitespace(spark):
    # NBSP / narrow-NBSP / ideographic space split tokens exactly like the
    # normalizer's Python \s does
    df = _docs(spark, ["mann mann", "båt mann", "ord　ord"])
    freq = {r["token"]: r["cnt"] for r in token_frequencies(df).collect()}
    assert freq == {"mann": 3, "båt": 1, "ord": 2}


def test_induced_variants_vetoed_by_corpus_vocabulary(spark):
    # 'kom' is top-frequency; 'korn' is a real but rarer corpus word that
    # happens to be an rn→m variant shape of 'kom' — the wider vocabulary
    # must veto the rewrite or every 'korn' would be corrupted corpus-wide
    df = _docs(spark, ["kom kom kom kom kom kom",
                       "korn korn på låven"])
    nz = normalizer_from_corpus(df, top_n=1, min_count=2, extra_table={})
    assert nz.normalize("korn korn") == "korn korn"


def test_prepare_corpus_scrub_cli(spark, tmp_path):
    from jobs.prepare_corpus import main

    base = ("og det som på av ikke å jeg skriver til kari@avis.no om "
            "https://avis.no/arkiv og det som på av ikke")
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "corpus")
    spark.createDataFrame([(1, base, "s0")],
                          "doc_id long, text string, source string") \
        .write.parquet(inp)
    main(["--input", inp, "--output", out, "--langs", "no",
          "--min-quality", "0.0", "--budget", "64", "--scrub"])
    text = spark.read.parquet(out).first()["text"]
    assert "[EMAIL]" in text and "[URL]" in text
    assert "kari@avis.no" not in text and "avis.no/arkiv" not in text
