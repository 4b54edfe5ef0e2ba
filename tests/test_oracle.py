"""Unit tests for the pure oracle extractor (no Ray needed).

Pins the deterministic behavior the Ray pipeline must reproduce
byte-for-byte (FIXTURES.md §2-3).
"""

from __future__ import annotations

import pytest

from textextract_ray.datagen import make_page, wrap_document_html
from textextract_ray.oracle import (
    MIN_HTML_BYTES,
    extract_document,
    sniff_charset,
)


def test_simple_article_extracts_all_blocks():
    res = extract_document(make_page(0))
    assert res.status == "ok"
    assert len(res.text) > 100
    assert len(res.spans) >= 2  # h1 + paragraphs
    # spans index into the text exactly
    for s in res.spans:
        assert res.text[s["start"] : s["end"]].strip() == res.text[s["start"] : s["end"]]


def test_boilerplate_stripped():
    res = extract_document(make_page(1))
    assert res.status == "ok"
    assert "Related" not in res.text  # sidebar heading
    assert "©" not in res.text  # footer


def test_link_farm_is_empty():
    assert extract_document(make_page(2)).status == "empty"


def test_entities_and_whitespace_frozen():
    res = extract_document(make_page(4))
    assert "Fish & chips <tag> café ä umlaut spaced out\nline two" in res.text
    assert "  code {\n    indent\t kept\n  }" in res.text  # pre preserved


def test_malformed_html_recovers():
    res = extract_document(make_page(5))
    assert res.status == "ok"
    assert len(res.text) > 50


def test_tiny_and_empty_invalid():
    assert extract_document(b"").status == "invalid"
    assert extract_document(b"<html><p>tiny</p></html>").status == "invalid"
    assert extract_document(None).status == "invalid"


def test_latin1_decode():
    res = extract_document(make_page(7))
    assert res.status == "ok"
    assert "Café naïve résumé" in res.text


def test_charset_sniff_order():
    assert sniff_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert sniff_charset(b'<meta charset="ISO-8859-1"><html>') == "iso-8859-1"
    assert sniff_charset(b"x" * 100) == "utf-8"


def test_giant_doc_ok_and_truncation():
    page = make_page(8, giant_bytes=1 << 18)
    res = extract_document(page)
    assert res.status == "ok"
    small = extract_document(page, max_output_bytes=100)
    assert small.status in ("truncated", "ok")


def test_script_style_noise_stripped():
    res = extract_document(make_page(10))
    assert "leak" not in res.text
    assert "secret" not in res.text
    assert "color: red" not in res.text


def test_binary_masquerade_unsupported():
    res = extract_document(make_page(11))
    assert res.status == "unsupported"
    res2 = extract_document(b"%PDF-1.7" + b"\x00" * 100)
    assert res2.status == "unsupported"
    assert "pdf" in res2.error


def test_determinism_and_purity():
    for d in range(24):
        a = extract_document(make_page(d, giant_bytes=1 << 16))
        b = extract_document(make_page(d, giant_bytes=1 << 16))
        assert a.text == b.text and a.spans == b.spans and a.status == b.status


def test_duplicate_class_is_exact_copy():
    assert make_page(9) == make_page(0)
    assert make_page(33) == make_page(12)


def test_spans_cover_blocks():
    res = extract_document(make_page(0))
    joined = "\n\n".join(res.text[s["start"] : s["end"]] for s in res.spans)
    assert joined == res.text


def test_document_roundtrip_byte_identity():
    text = "the quick brown fox jumps over the lazy dog " * 3
    text = text.strip()
    res = extract_document(wrap_document_html(42, text))
    assert res.status == "ok"
    assert res.text == text


def test_never_raises_on_garbage():
    import random

    rng = random.Random(1)
    for _ in range(50):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2048)))
        res = extract_document(blob)
        assert res.status in ("ok", "empty", "invalid", "unsupported", "parse_error")


def test_min_html_bytes_boundary():
    just_under = b"x" * (MIN_HTML_BYTES - 1)
    assert extract_document(just_under).status == "invalid"


def test_datagen_idempotent(tmp_path):
    """FIXTURES.md §6: regenerating produces byte-identical Parquet."""
    from textextract_ray.datagen import generate_pages

    a = generate_pages(str(tmp_path / "a"), 60, 3, giant_bytes=1 << 16)
    b = generate_pages(str(tmp_path / "b"), 60, 3, giant_bytes=1 << 16)
    for fa, fb in zip(a, b):
        assert open(fa, "rb").read() == open(fb, "rb").read()
