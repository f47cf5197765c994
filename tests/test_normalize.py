"""Orthography-normalizer (X4′) spec tests."""

from norsk_historisk_avis_ocr_spark.stages.normalize import (
    OrthographyNormalizer, default_normalizer,
)


def test_basic_confusion_rewrites():
    n = default_normalizer()
    assert n.normalize("en rnann gikk") == "en mann gikk"
    assert n.normalize("clet var sarnme dag") == "det var samme dag"
    assert n.normalize("liar du sett") == "har du sett"


def test_preserve_1950s_forms():
    n = default_normalizer()
    assert n.normalize("hvad er bleven av nu") == "hvad er bleven av nu"
    assert n.normalize("efter krigen") == "efter krigen"


def test_case_preserved():
    n = default_normalizer()
    assert n.normalize("Rnann og RNANN") == "Mann og MANN"


def test_punctuation_detached():
    n = default_normalizer()
    assert n.normalize("«rnann», (clet).") == "«mann», (det)."


def test_longest_match_first():
    n = OrthographyNormalizer({"for": "b", "for di": "fordi"})
    assert n.normalize("for di han kom") == "fordi han kom"
    assert n.normalize("for han kom") == "b han kom"


def test_never_deletes_words():
    n = default_normalizer()
    text = "ord som ikke finnes i tabellen forblir urørt"
    assert n.normalize(text) == text
    assert len(n.normalize("rnann clet liar").split()) == 3


def test_table_roundtrip():
    n = default_normalizer()
    table, preserve = n.to_table()
    n2 = OrthographyNormalizer(table, preserve)
    sample = "Rnann sa hvad clet var, for di sarnme dag."
    assert n2.normalize(sample) == n.normalize(sample)


def test_build_confusion_table_roundtrip():
    from norsk_historisk_avis_ocr_spark.stages.normalize import (
        CONFUSION_PAIRS, DEFAULT_LEXICON, build_confusion_table,
    )
    t = build_confusion_table(DEFAULT_LEXICON)
    assert t["rnann"] == "mann"
    assert t["lijem"] == "hjem"
    assert t["aar"] == "år"
    # no lexicon word is ever a key (would rewrite correct text)
    assert not set(t) & set(DEFAULT_LEXICON)
    # deterministic
    assert t == build_confusion_table(DEFAULT_LEXICON)


def test_generated_variants_normalize():
    n = default_normalizer()
    assert n.normalize("clen liolder vaere spraak") == "den holder være språk"
    # real words outside the table untouched
    assert n.normalize("korn og hav") == "korn og hav"


def test_normalizer_properties_hypothesis():
    from hypothesis import given, settings, strategies as st
    from norsk_historisk_avis_ocr_spark.stages.normalize import (
        DEFAULT_LEXICON, DEFAULT_TABLE,
    )
    n = default_normalizer()
    vocab = (list(DEFAULT_TABLE) + DEFAULT_LEXICON
             + ["hvad", "bleven", "xyzzy", "og", "«ord»", "slutt."])
    token = st.sampled_from(vocab)
    sep = st.sampled_from([" ", "\n", "\n\n", "  "])

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(token, sep), max_size=12))
    def prop(pairs):
        text = "".join(t + s for t, s in pairs).rstrip()
        out = n.normalize(text)
        # idempotent: replacement words are never themselves rewrite keys
        assert n.normalize(out) == out
        # whitespace runs preserved where no multi-token rule fired
        import re
        if len(re.split(r"\s+", out)) == len(re.split(r"\s+", text)):
            assert re.findall(r"\s+", out) == re.findall(r"\s+", text)

    prop()
