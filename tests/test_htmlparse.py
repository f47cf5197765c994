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
