"""Byte-identity contract for the HTML extractor (input_hint invariant)."""

from kgspark.extract import extract_text_from_html
from kgspark.synth import build_html, html_escape, synth_corpus_pdf


def test_roundtrip_byte_identity_on_corpus():
    pdf = synth_corpus_pdf(n_docs=80, seed=7)
    for _, row in pdf.iterrows():
        assert extract_text_from_html(row["html"]) == row["text"]


def test_escaped_entities_roundtrip():
    text = "a < b & b > c\nsecond <p>ara"
    assert extract_text_from_html(build_html(text, "k")) == text


def test_boilerplate_is_stripped():
    out = extract_text_from_html(build_html("only the content", 1))
    assert out == "only the content"
    assert "home" not in out  # nav
    assert "CommonCrawl" not in out  # header
    assert "kgspark" not in out  # footer
    assert "doc-1" not in out  # title inside head


def test_comments_and_nested_blocks():
    html = (
        b"<html><body><!-- hidden --><div>one<p>two</p></div>"
        b"<ul><li>three</li><li>four</li></ul></body></html>"
    )
    assert extract_text_from_html(html) == "one\ntwo\nthree\nfour"


def test_header_tag_does_not_eat_head_sibling():
    html = b"<html><header>zap</header><body><p>keep</p></body></html>"
    assert extract_text_from_html(html) == "keep"


def test_none_and_empty():
    assert extract_text_from_html(None) is None
    assert extract_text_from_html(b"") == ""
    assert extract_text_from_html(b"<html><body></body></html>") == ""


def test_html_escape_order():
    assert html_escape("&lt;") == "&amp;lt;"
