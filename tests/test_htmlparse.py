"""Generator ↔ parser round trip and classifier behavior."""

from norsk_historisk_avis_ocr_spark.sources.pages import build_page
from norsk_historisk_avis_ocr_spark.stages.htmlparse import (
    classify_blocks, extract_sections, parse_blocks,
)


def test_roundtrip_all_docs(documents_rows):
    for d in documents_rows:
        p = build_page(d["doc_id"], d["text"], d["lang"])
        header, cols = extract_sections(p["html"])
        assert header == p["planted_header"], p["url"]
        if p["planted_columns"]:
            assert cols == p["planted_columns"], p["url"]
        else:
            assert cols == [""], p["url"]  # boilerplate-only page


def test_boilerplate_stripped_by_link_density():
    html = (b"<html><body>"
            b"<nav><a href='/a'>Lenke en</a> | <a href='/b'>Lenke to</a></nav>"
            b"<div><p>Selve innholdet i artikkelen er ganske langt.</p></div>"
            b"<footer><a href='/c'>Om</a> <a href='/d'>Kontakt oss</a></footer>"
            b"</body></html>")
    labeled = classify_blocks(parse_blocks(html))
    kinds = [k for k, _ in labeled]
    assert kinds.count("boilerplate") == 2
    assert kinds.count("column") == 1


def test_masthead_only_before_flow():
    html = (b"<html><body><header><h1>AVISEN</h1></header>"
            b"<table><tr><td>kolonne en tekst</td></tr></table>"
            b"<h2>Mellomtittel efterpaa</h2></body></html>")
    header, cols = extract_sections(html)
    assert header == "AVISEN"
    # the later heading is NOT a masthead; it lands as a column block
    assert "kolonne en tekst" in cols[0]
    assert any("Mellomtittel" in c for c in cols)


def test_entities_and_br_roundtrip():
    html = "<html><body><div><p>r&aelig;v &amp; søl<br/>ny linje</p></div></body></html>"
    header, cols = extract_sections(html.encode("utf-8"))
    assert header is None
    assert cols == ["ræv & søl\nny linje"]


def test_no_content_fallback_empty():
    html = b"<html><body><nav><a href='/x'>Alt er lenker her</a></nav></body></html>"
    header, cols = extract_sections(html)
    assert header is None
    assert cols == [""]


def test_malformed_html_is_total():
    bad = b"<html><body><div><td>ufullstendig <b>markup"
    header, cols = extract_sections(bad)
    assert cols  # never raises, always yields sections


def test_generator_edge_cases_present_and_handled(documents_rows):
    """FIXTURES.md §1 edge rows: each planted edge case appears in the
    corpus and takes its intended path."""
    by_mod = lambda m: [d for d in documents_rows if d["doc_id"] % m == 0]
    # empty body (boilerplate only)
    for d in by_mod(13):
        p = build_page(d["doc_id"], d["text"], d["lang"])
        assert p["planted_columns"] == []
        assert extract_sections(p["html"]) == (None, [""])
    # single column, no table markup
    for d in by_mod(11):
        if d["doc_id"] % 13 == 0:
            continue
        p = build_page(d["doc_id"], d["text"], d["lang"])
        hdr, cols = extract_sections(p["html"])
        assert hdr is None and len(cols) == 1
    # masthead absent
    no_head = [d for d in documents_rows
               if d["doc_id"] % 7 == 0 and d["doc_id"] % 13 != 0]
    assert no_head
    for d in no_head:
        p = build_page(d["doc_id"], d["text"], d["lang"])
        assert p["planted_header"] is None
    # all-garbage column reflows to empty and is dropped from transcribed
    from norsk_historisk_avis_ocr_spark.stages import (
        clean_divider_noise, transcribe_sections,
    )
    garbage_docs = [d for d in documents_rows
                    if d["doc_id"] % 17 == 0
                    and d["doc_id"] % 13 != 0 and d["doc_id"] % 11 != 0]
    assert garbage_docs
    for d in garbage_docs:
        p = build_page(d["doc_id"], d["text"], d["lang"])
        cleaned = [clean_divider_noise(c) for c in p["planted_columns"]]
        n_nonempty = sum(
            1 for c in cleaned
            if c.strip() and transcribe_sections([c]) != "\n")
        out = transcribe_sections(cleaned)
        assert out.count("\n\n") <= max(n_nonempty - 1, 0) + 1


def test_fast_scanner_equals_stdlib(documents_rows):
    """The regex scanner and stdlib HTMLParser drive one builder; assert
    identical block streams over the whole corpus and adversarial cases."""
    cases = [build_page(d["doc_id"], d["text"], d["lang"])["html"]
             for d in documents_rows[:200]]
    cases += [
        b"<html><body><div><td>trunkert <b>markup",
        b"\xff\xfe binaert \x00",
        b"<!-- kommentar --><p>x &amp; y</p>",
        "<div><script>if(a<b){x()}</script><p>etter</p></div>".encode(),
        b"<style>td>a{color:red}</style><p>kropp</p>",
        b"<div/><p>selvlukkende</p>",
        "<p>&aelig;&oslash;&aring;</p>".encode(),
    ]
    for html in cases:
        fast = [(b.tag, b.parent_tag, b.depth, b.text, b.link_chars)
                for b in parse_blocks(html, engine="fast")]
        std = [(b.tag, b.parent_tag, b.depth, b.text, b.link_chars)
               for b in parse_blocks(html, engine="stdlib")]
        assert fast == std


def test_charset_sniffing_latin1():
    body = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>blåbærsyltetøy</p></body></html>"
    html = body.encode("iso-8859-1")
    header, cols = extract_sections(html)
    assert cols == ["blåbærsyltetøy"]


def test_charset_default_utf8():
    html = "<p>blåbær</p>".encode("utf-8")
    assert extract_sections(html)[1] == ["blåbær"]


def test_charset_unknown_falls_back():
    html = b"<meta charset='no-such-codec'><p>tekst her</p>"
    assert extract_sections(html)[1] == ["tekst her"]


def test_fast_scanner_equals_stdlib_hypothesis():
    """Randomized well-formed-ish fragments: both tokenizers must agree."""
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["ord", "tekst &amp; mer", "a", "læse", "12", "x|y"])
    tags = st.sampled_from(["div", "p", "td", "h1", "nav", "li"])

    @st.composite
    def fragment(draw, depth=0):
        kind = draw(st.integers(0, 3 if depth < 3 else 1))
        if kind <= 1:
            return draw(words)
        if kind == 2:
            t = draw(tags)
            inner = "".join(draw(st.lists(fragment(depth=depth + 1), max_size=3)))
            return f"<{t}>{inner}</{t}>"
        return draw(words) + "<br/>" + draw(words)

    @settings(max_examples=120, deadline=None)
    @given(st.lists(fragment(), max_size=6), st.booleans())
    def prop(frags, truncate):
        html = "<html><body>" + "".join(frags) + "</body></html>"
        if truncate:
            html = html[:max(12, len(html) - 9)]
        fast = [(b.tag, b.parent_tag, b.depth, b.text, b.link_chars)
                for b in parse_blocks(html, engine="fast")]
        std = [(b.tag, b.parent_tag, b.depth, b.text, b.link_chars)
               for b in parse_blocks(html, engine="stdlib")]
        assert fast == std

    prop()


def test_extract_one_total_on_random_bytes():
    """The per-page function must never raise — a poison page would kill a
    1000-executor stage (quarantine covers size/null, totality covers the
    rest)."""
    from hypothesis import given, settings, strategies as st
    from norsk_historisk_avis_ocr_spark.functions.udfs import extract_one
    from norsk_historisk_avis_ocr_spark.stages.normalize import (
        default_normalizer,
    )
    norm = default_normalizer()

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def prop(data):
        row = extract_one("u", data, norm)
        assert row["combined"].endswith("\n")
        assert row["final"].endswith("\n")

    prop()


def test_null_html_is_an_empty_page():
    """Totality includes null payloads (nullable binary column at scale):
    a None html row extracts as the empty page, not a task failure."""
    from norsk_historisk_avis_ocr_spark.functions.udfs import extract_one
    from norsk_historisk_avis_ocr_spark.stages.htmlparse import (
        extract_sections, parse_blocks,
    )
    assert parse_blocks(None) == []
    assert extract_sections(None) == (None, [""])
    row = extract_one("u", None, None)
    assert row["final"] == "\n" and row["metrics"]["html_bytes"] == 0
