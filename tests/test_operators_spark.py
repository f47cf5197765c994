"""Hand-computed small-case tests for the relational operators."""

import pytest
from pyspark.sql import functions as F

from norsk_historisk_avis_ocr_spark.operators import dedup as dd
from norsk_historisk_avis_ocr_spark.operators import quality as q
from norsk_historisk_avis_ocr_spark.operators import similarity as sim
from norsk_historisk_avis_ocr_spark.operators import windows as w


@pytest.fixture(scope="module")
def events(spark):
    # user 1, type a: ids 1,2,3, 7,8 → islands (1-3, len3), (7-8, len2)
    # user 1, type b: id 4          → island (4, len1)
    # user 2, type a: ids 10,11     → island (10-11, len2)
    rows = [(1, "a", 1, 1.0), (1, "a", 2, 2.0), (1, "a", 3, 3.0),
            (1, "a", 7, 4.0), (1, "a", 8, 5.0), (1, "b", 4, 6.0),
            (2, "a", 10, 7.0), (2, "a", 11, 8.0)]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, value double")


def test_runlength_islands(events):
    got = {(r.user_id, r.event_type, r.island_start): (r.island_end, r.island_len)
           for r in w.runlength_islands(events).collect()}
    assert got == {(1, "a", 1): (3, 3), (1, "a", 7): (8, 2),
                   (1, "b", 4): (4, 1), (2, "a", 10): (11, 2)}


def test_largest_island_leftmost_tie(spark):
    # user 1 has two islands of len 2 → leftmost (1-2) wins
    rows = [(1, "a", 1), (1, "a", 2), (1, "a", 5), (1, "a", 6)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, event_id long")
    got = w.largest_island_per_user(df).collect()
    assert len(got) == 1
    assert (got[0].island_start, got[0].island_end, got[0].island_len) == (1, 2, 2)


def test_moving_average_window_frame(events):
    rows = {r.event_id: r.smoothed
            for r in w.moving_average(events, half_window=1).collect()
            if r.user_id == 1}
    # user 1 ordered by event_id: (1,1.0)(2,2.0)(3,3.0)(7,4.0)(8,5.0)(4,6.0)?
    # no — type doesn't partition; order: 1,2,3,4,7,8 values 1,2,3,6,4,5
    assert rows[1] == pytest.approx(1.5)   # (1+2)/2
    assert rows[2] == pytest.approx(2.0)   # (1+2+3)/3
    assert rows[4] == pytest.approx(4.333333)  # (3+6+4)/3


def test_upper_median_is_len_div_2(spark):
    # 4 values sorted [1,2,3,9] → element at idx 4//2 = 2 → 3 (not 2.5)
    rows = [("A", 1.0, 1, 1), ("A", 9.0, 1, 2), ("A", 2.0, 1, 3), ("A", 3.0, 1, 4)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_orderkey long, l_linenumber int")
    got = w.upper_median(df).collect()
    assert got[0].upper_median_qty == 3.0


def test_sessionize_gap(spark):
    rows = [(1, "2020-01-01 00:00:00"), (1, "2020-01-01 00:10:00"),
            (1, "2020-01-01 01:00:00"),  # 50min gap → new session
            (2, "2020-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = sorted([(r.user_id, r.n_events) for r in w.sessionize(df).collect()])
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x"), (4, "x")], "doc_id long, text string")
    got = dd.exact_duplicates(df).collect()
    assert len(got) == 1
    assert (got[0].keep_id, got[0].n_members) == (1, 3)


def test_ngram_jaccard_identical_docs(spark):
    text = "en to tre fire fem seks"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "helt annerledes innhold her nå ja")],
        "doc_id long, text string")
    got = dd.ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert len(got) == 1
    assert (got[0].doc_a, got[0].doc_b, got[0].jaccard) == (1, 2, 1.0)


def test_ngram_jaccard_hot_shingle_cap(spark):
    # docs 1-4 share only the boilerplate shingle (df=4); docs 1+2 also
    # share unique content. With the cap the boilerplate-only pairs vanish
    # and jaccard is computed over the capped sets on both sides.
    boiler = "felles bunntekst her"
    # per-doc separator words keep cross-boundary shingles unique, so the
    # ONLY shingle shared by docs 3 and 4 is the boilerplate itself (df=4)
    df = spark.createDataFrame(
        [(1, f"unik tekst en a1 {boiler}"), (2, f"unik tekst en a2 {boiler}"),
         (3, f"noe helt annet a3 {boiler}"),
         (4, f"enda mer annet a4 {boiler}")],
        "doc_id long, text string")
    uncapped = {(r.doc_a, r.doc_b)
                for r in dd.ngram_jaccard_pairs(df, k=3,
                                                threshold=0.01).collect()}
    capped = {(r.doc_a, r.doc_b)
              for r in dd.ngram_jaccard_pairs(
                  df, k=3, threshold=0.01, max_shingle_df=3).collect()}
    assert (3, 4) in uncapped       # boilerplate-only overlap pairs...
    assert (3, 4) not in capped     # ...are exactly what the cap removes
    assert (1, 2) in capped         # real-content overlap survives


def test_minhash_lsh_finds_identical(spark):
    text = "en to tre fire fem seks sju åtte ni ti"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "noe helt annet står skrevet i denne")],
        "doc_id long, text string")
    got = dd.minhash_lsh_pairs(df, est_threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b, r.est_jaccard) for r in got] == [(1, 2, 1.0)]


def test_simhash_identical_and_distance(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "p q r s")],
        "doc_id long, text string")
    vals = {r.doc_id: r.simhash for r in dd.simhash_values(df).collect()}
    assert vals[1] == vals[2] != vals[3]
    pairs = dd.simhash_dup_pairs(df, max_hamming=0).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_cosine_topk_exact(spark):
    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1),
            (3, [0.7071, 0.7071], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = sim.cosine_topk(df, 0, k=3).collect()
    assert [r.vec_id for r in got] == [1, 3, 2]
    assert got[0].cos_sim == 1.0
    assert got[1].cos_sim == pytest.approx(0.707, abs=1e-3)
    assert got[2].cos_sim == 0.0


def test_ivf_restricts_to_cell(spark):
    rows = [(0, [1.0, 0.0], 7), (1, [1.0, 0.1], 7), (2, [1.0, 0.0], 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = sim.ivf_topk(df, 0, k=5).collect()
    assert [r.vec_id for r in got] == [1]  # vec 2 is in another cell


def test_lsh_bucket_contains_identical(spark):
    rows = [(0, [0.5, -0.25, 1.0], 0), (1, [0.5, -0.25, 1.0], 0),
            (2, [-0.5, 0.25, -1.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = sim.lsh_bucket_topk(df, 0, k=5).collect()
    ids = [r.vec_id for r in got]
    assert 1 in ids          # identical vector always shares the bucket
    assert 2 not in ids      # antipode never does (all signs flip)


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog in the house"),
         (2, "og det som ikke hvad på av"),
         (3, "zzz qqq www")],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in q.language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "no"  # 'no' beats 'da' on hits (på, av vs af)
    assert got[3] == "und"


def test_stopwords_golden_content():
    """The DuckDB oracle derives its marker table FROM STOPWORDS (single
    source of truth), so oracle parity can no longer catch accidental
    edits to the dict itself — this golden copy can. Update deliberately,
    never to silence a failure."""
    from norsk_historisk_avis_ocr_spark.functions.textqual import STOPWORDS
    assert STOPWORDS == {
        "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
        "no": ["og", "det", "som", "på", "av", "ikke", "hvad", "å", "jeg"],
        "da": ["og", "det", "som", "af", "ikke", "hvad", "jeg", "en", "til"],
        "sv": ["och", "det", "som", "av", "inte", "jag", "en", "till", "på"],
        "de": ["und", "der", "die", "das", "nicht", "ist", "mit", "ein",
               "zu"],
        "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour",
               "que"],
        "es": ["el", "los", "las", "una", "pero", "por", "para", "con",
               "más"],
    }


def test_language_id_de_fr_es(spark):
    df = spark.createDataFrame(
        [(1, "der hund und die katze ist nicht mit ein zu das haus"),
         (2, "le chat est dans la maison pour les autres que des amis"),
         (3, "el perro está con los gatos pero por una casa para más")],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in q.language_id(df).collect()}
    assert got == {1: "de", 2: "fr", 3: "es"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab 12 c-d"), (2, "   ")],
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
           for r in q.token_counts(df).collect()}
    assert got[1] == (3, 5)  # ws: [ab,12,c-d]; bpe: ab,12,c,-,d
    assert got[2][0] == 0


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "abcdefghij"), (2, "abcdefghij")],
                               "doc_id long, text string")
    got = [r.fp for r in q.fingerprints(df).collect()]
    assert got[0] == got[1] is not None


def test_embedding_dup_pairs_exact(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sim.embedding_dup_pairs(df, threshold=0.9).collect()
    assert [(r.vid_a, r.vid_b) for r in got] == [(0, 1)]
    assert got[0].cos_sim == pytest.approx(1.0, abs=2e-3)


def test_embedding_dup_pairs_lsh_subset_of_exact(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows.append((100, list(rows[0][1])))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.vid_a, r.vid_b)
             for r in sim.embedding_dup_pairs(df, threshold=0.3).collect()}
    lsh = {(r.vid_a, r.vid_b)
           for r in sim.embedding_dup_pairs_lsh(df, threshold=0.3).collect()}
    assert lsh <= exact          # LSH never invents pairs
    assert (0, 100) in lsh       # identical vectors always share the bucket


def test_hyperplane_signature_empty_and_null_inputs(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<float>")
    assert sim.hyperplane_signature(empty).count() == 0
    assert sim.lsh_bucket_topk(empty, 0).count() == 0
    nulls = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    rows = {r.vec_id: r.lsh_sig
            for r in sim.hyperplane_signature(nulls).collect()}
    assert rows[0] == 0 and rows[1] >= 0  # null embedding → sig 0


def test_embedding_dup_pairs_multi_probe_recall(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows.append((100, list(rows[0][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.vid_a, r.vid_b)
             for r in sim.embedding_dup_pairs(df, threshold=0.3).collect()}
    single = {(r.vid_a, r.vid_b)
              for r in sim.embedding_dup_pairs_lsh(df, threshold=0.3)
              .collect()}
    probed = {(r.vid_a, r.vid_b)
              for r in sim.embedding_dup_pairs_lsh(
                  df, threshold=0.3, multi_probe=True).collect()}
    assert single <= probed <= exact   # probes add recall, never invent
    assert len(probed) > len(single)   # ...and actually add some here


def test_corpus_prep_composed_filters(spark):
    from norsk_historisk_avis_ocr_spark.operators.quality import corpus_prep
    en = ("the cat and the dog went to the house and it is known that "
          "they sat there for hours with the others and all was well " * 3)
    no = ("og det var som om ikke noe kunne skje på denne dagen å jeg "
          "visste hvad det var " * 4)
    docs = spark.createDataFrame(
        [(1, en), (2, en), (3, no), (4, "x! ??")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           corpus_prep(docs, min_quality=0.3, langs=("en",)).collect()}
    assert set(got) == {1}            # dup 2 dropped, no-lang 3, junk 4
    assert got[1].pred_lang == "en" and got[1].quality >= 0.3
    assert got[1].n_ws_tokens > 50
    # language allowlist is honored
    both = corpus_prep(docs, min_quality=0.3, langs=("en", "no")).collect()
    assert {r.doc_id for r in both} == {1, 3}


def test_dedup_keep_first_materializer(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x"), (4, "z"), (5, "y")],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in dd.dedup_keep_first(df).collect())
    assert kept == [1, 2, 4]


def test_drop_near_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in dd.drop_near_duplicates(docs, pairs).collect())
    assert kept == [1, 2]


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3, pair 7-9, singleton 5 not in pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long")
    comps = {r.doc_id: r.component_id
             for r in dd.connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_connected_components_long_chain_converges(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long")
    comps = {r.doc_id: r.component_id
             for r in dd.connected_components(pairs).collect()}
    assert set(comps.values()) == {1}
    assert len(comps) == 12


def test_connected_components_star_matches_propagation(spark):
    import random
    cases = [
        [(1, 2), (2, 3), (7, 9)],                    # chain + pair
        [(i, i + 1) for i in range(1, 20)],          # long path (O(log) vs
                                                      # O(diameter) rounds)
        [(1, 2), (1, 3), (2, 3), (10, 11), (12, 13), (11, 12)],
    ]
    rng = random.Random(42)
    cases.append([(rng.randrange(60), rng.randrange(60))
                  for _ in range(80)])                # random multigraph
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        ref = {r.doc_id: r.component_id
               for r in dd.connected_components(pairs, max_iter=60).collect()}
        star = {r.doc_id: r.component_id
                for r in dd.connected_components_star(pairs).collect()}
        assert star == ref


def test_dedup_by_components(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in dd.dedup_by_components(docs, pairs).collect())
    assert kept == [1, 4, 5]


def test_topk_per_group(spark):
    rows = [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 7.0), (1, 13, 1.0),
            (2, 20, 3.0)]
    df = spark.createDataFrame(rows, "o_custkey long, o_orderkey long, o_totalprice double")
    got = [(r.o_custkey, r.o_orderkey, r.rank_in_group)
           for r in w.topk_per_group(df, k=2).orderBy("o_custkey", "rank_in_group").collect()]
    assert got == [(1, 11, 1), (1, 12, 2), (2, 20, 1)]


def test_exact_quantiles_disc_semantics(spark):
    rows = [("A", float(v), 1, i) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_orderkey long, l_linenumber int")
    r = w.exact_quantiles(df).first()
    # n=4: q25 -> rank ceil(1)=1 -> 1.0; q50 -> rank 2 -> 2.0; q75 -> rank 3 -> 3.0
    assert (r.q25, r.q50, r.q75) == (1.0, 2.0, 3.0)


def test_pattern_hygiene_counts_and_scrub(spark):
    from norsk_historisk_avis_ocr_spark.operators.quality import (
        pattern_hygiene, scrub_patterns,
    )

    rows = [
        (1, "skriv til kari@avis.no eller se https://avis.no/x?y=1 "
            "tlf +47 22 33 44 55"),
        (2, "ingen kontaktinfo her, bare tekst fra 1950 og 1951"),
        (3, "to adresser: a@b.no c@d.org og https://e.no/f@g.no"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pattern_hygiene(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_urls"], got[1]["n_phones"]) \
        == (1, 1, 1)
    assert got[2]["n_emails"] == 0 and got[2]["n_urls"] == 0
    # f@g.no sits inside the URL: counted as an email match too (the URL
    # regex does not own it for counting), but scrubbed as part of the URL
    assert got[3]["n_emails"] == 3 and got[3]["n_urls"] == 1

    scrubbed = {r["doc_id"]: r["text"]
                for r in scrub_patterns(df).collect()}
    assert "[EMAIL]" in scrubbed[1] and "[URL]" in scrubbed[1]
    assert "kari@avis.no" not in scrubbed[1]
    assert "avis.no/x" not in scrubbed[1]
    assert scrubbed[2] == rows[1][1]  # untouched text passes through
    # URL masked first, so the embedded address went with it
    assert scrubbed[3].endswith("a@b.no c@d.org og [URL]"
                                .replace("a@b.no c@d.org",
                                         "[EMAIL] [EMAIL]"))


def test_bigram_familiarity_flags_garbage(spark):
    from norsk_historisk_avis_ocr_spark.operators.quality import (
        bigram_familiarity,
    )

    clean = "det er en helt vanlig norsk setning om dagen og veien"
    rows = [(i, clean) for i in range(6)]
    rows.append((100, "qz xq zq jw wj qx zx xz qq zz"))  # rare bigrams
    rows.append((101, "a"))  # shorter than one bigram: absent from output
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bigram_familiarity(df, min_count=5).collect()}
    assert 101 not in got
    assert got[0]["familiarity"] == 1.0  # every bigram common by repetition
    assert got[100]["familiarity"] < 0.5  # garbage text scores low
    assert got[100]["n_bigrams"] > got[100]["n_common"]


def test_embedding_dup_pairs_max_rows_fence(spark):
    """The all-pairs baseline must refuse a candidate set above max_rows
    instead of silently launching an O(n^2) join (VERDICT r3 item 8)."""
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="max_rows"):
        sim.embedding_dup_pairs(df, max_rows=4).collect()
    # at or under the fence (and with max_rows=None) it runs normally
    assert sim.embedding_dup_pairs(df, max_rows=5).count() >= 0
    assert sim.embedding_dup_pairs(df, max_rows=None).count() >= 0
