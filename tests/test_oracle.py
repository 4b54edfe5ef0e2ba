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


def test_attribute_quoting_edge_cases():
    """'>' inside quoted attributes must not terminate the tag."""
    html = (
        b'<html><meta charset="utf-8"><body><article>'
        b'<p data-x="a>b" title=\'c>d\'>quoted attribute text survives here intact</p>'
        b"</article></body></html>"
    )
    res = extract_document(html)
    assert res.status == "ok"
    assert res.text == "quoted attribute text survives here intact"
    assert "a>b" not in res.text


def test_stray_lt_in_text():
    """'<' followed by a non-letter is text; '<b' is a tag (browser
    behavior — it swallows up to the next '>')."""
    html = (
        b'<html><meta charset="utf-8"><body><article>'
        b"<p>math like 1 < 2 stays readable in the output text of this paragraph</p>"
        b"</article></body></html>"
    )
    res = extract_document(html)
    assert res.status == "ok"
    assert "1 < 2" in res.text
    # the a<b case: parsed as an open tag exactly like a browser does
    html2 = (
        b'<html><meta charset="utf-8"><body><article>'
        b"<p>this paragraph is long enough to survive pruning a<b and the tag eats to the next gt sign> tail text</p>"
        b"</article></body></html>"
    )
    res2 = extract_document(html2)
    assert "a tail text" in res2.text.replace("pruning tail", "pruning  tail") or "tail text" in res2.text


def test_unclosed_script_swallows_to_eof():
    html = (
        b'<html><meta charset="utf-8"><body><article>'
        b"<p>real content paragraph before the broken script tag here</p>"
        b"<script>var x = 'never closed"
    )
    res = extract_document(html)
    assert res.status == "ok"
    assert "never closed" not in res.text
    assert "real content" in res.text


def test_deep_nesting_no_recursion_error():
    html = (
        b'<html><meta charset="utf-8"><body>'
        + b"<div>" * 5000
        + b"<p>deeply nested content paragraph that must still be found</p>"
        + b"</div>" * 5000
        + b"</body></html>"
    )
    res = extract_document(html)
    assert res.status == "ok"
    assert "deeply nested" in res.text


def test_case_insensitive_tags():
    html = (
        b'<HTML><META CHARSET="utf-8"><BODY><ARTICLE>'
        b"<P>upper case tags are the same as lower case tags here</P>"
        b"</ARTICLE></BODY></HTML>"
    )
    res = extract_document(html)
    assert res.status == "ok"
    assert res.text == "upper case tags are the same as lower case tags here"


def test_cdata_and_comments_stripped():
    html = (
        b'<html><meta charset="utf-8"><body><article>'
        b"<p>before the markers comes some visible text</p>"
        b"<!-- comment leak --><![CDATA[cdata leak]]>"
        b"<p>after the markers comes more visible text</p></article></body></html>"
    )
    res = extract_document(html)
    assert "comment leak" not in res.text
    assert "cdata leak" not in res.text
    assert "before the markers" in res.text and "after the markers" in res.text


def test_utf16_bom_decode():
    body = (
        '<html><body><article><p>utf sixteen little endian page body '
        "with enough text to keep</p></article></body></html>"
    )
    payload = b"\xff\xfe" + body.encode("utf-16-le")
    res = extract_document(payload)
    assert res.status == "ok"
    assert "utf sixteen little endian" in res.text
    payload_be = b"\xfe\xff" + body.encode("utf-16-be")
    res_be = extract_document(payload_be)
    assert res_be.status == "ok"
    assert res_be.text == res.text


def test_frozen_behavior_digest():
    """Golden digest over 600 fixture pages (all 12 classes × 50).

    The e2e tests compare pipeline vs oracle — both sides MOVE TOGETHER
    if the oracle's behavior drifts, so this digest is the only guard
    that pins the extraction contract across rounds. An INTENTIONAL
    behavior change must update this constant AND bump
    EXTRACTOR_VERSION (checkpoint resume depends on it)."""
    import hashlib
    import json

    h = hashlib.sha256()
    for i in range(600):
        r = extract_document(make_page(i, giant_bytes=1 << 17))
        h.update(r.status.encode())
        h.update(r.text.encode())
        h.update(json.dumps(r.spans).encode())
    assert (
        h.hexdigest()
        == "c6ed2c7d29653013328a2e3e19fe019cc81e8f13bf77d67149e950aae00fdfc8"
    )


def test_full_list_item_fast_token_semantics():
    """The '<li...><a...>text</a></li>' single-token fast path must be
    transition-identical to the five generic iterations it replaces:
    same blocks, same link accounting, same pre/whitespace handling.
    Each case pairs a fast-path form with a structurally equivalent
    slow-path form (whitespace inside the close tags forces the
    generic alternatives) and asserts identical extraction."""
    shell = "<html><head><title>t</title></head><body>{}</body></html>"
    pairs = [
        # plain item; slow twin uses '</a ></li >' to miss the fast token
        ('<li><a href="/x">alpha beta</a></li>',
         '<li><a href="/x">alpha beta</a ></li >'),
        # whitespace gap between <li> and <a>
        ('<li>  <a href="/x">gamma delta</a></li>',
         '<li>  <a href="/x">gamma delta</a ></li >'),
        # entities + internal whitespace runs collapse identically
        ('<li><a>AT&amp;T   still  one&nbsp;run</a></li>',
         '<li><a>AT&amp;T   still  one&nbsp;run</a ></li >'),
        # attribute soup incl. quoted '>' and unquoted values
        ('<li class="x>y" data-a=\'1\'><a href=/p rel=no>word up</a></li>',
         '<li class="x>y" data-a=\'1\'><a href=/p rel=no>word up</a ></li >'),
        # whitespace-only text drops in both paths
        ('<li><a href="/x">   </a></li>', '<li><a href="/x">   </a ></li >'),
        # empty text
        ('<li><a href="/x"></a></li>', '<li><a href="/x"></a ></li >'),
    ]
    for fast, slow in pairs:
        a = extract_document(shell.format("<article><p>" + "content words " * 6 + "</p>" + fast * 3 + "</article>").encode())
        b = extract_document(shell.format("<article><p>" + "content words " * 6 + "</p>" + slow * 3 + "</article>").encode())
        assert a.text == b.text, (fast, a.text, b.text)
        assert a.spans == b.spans, fast
    # inside <pre>, the gap and text survive verbatim in both forms
    pre_fast = "<pre><li> <a>x  y</a></li></pre>"
    pre_slow = "<pre><li> <a>x  y</a ></li ></pre>"
    a = extract_document(shell.format(pre_fast).encode())
    b = extract_document(shell.format(pre_slow).encode())
    assert a.text == b.text and a.spans == b.spans
    # markup inside the item text falls back to the generic path
    nested = shell.format(
        "<article>" + '<li><a href="/x">has <b>bold</b> inside</a></li>' * 2 + "</article>"
    )
    r = extract_document(nested.encode())
    assert r.status in ("ok", "empty")  # short all-link items filter out


def test_full_list_item_link_density_accounting():
    """link_chars from the fast token must still convict link farms:
    a page of only short <li><a> items extracts empty either way."""
    farm = "".join(f'<li><a href="/p{i}">w{i}</a></li>' for i in range(200))
    page = f"<html><body><ul>{farm}</ul></body></html>".encode()
    r = extract_document(page)
    assert r.status == "empty"  # every block convicted by link density
    assert r.text == ""


def test_li_run_token_equivalence():
    """A RUN of consecutive <li><a>…</a></li> items (with and without
    whitespace separators) must extract identically to the generic
    tokenization (forced via whitespace inside the close tags), in
    both normal and <pre> contexts, including a malformed tail item."""
    shell = "<html><head><title>t</title></head><body><article><p>{}</p>{}</article></body></html>"
    filler = "content words " * 6
    items_f = "".join(f'<li><a href="/p{i}">word {i} here</a></li>' for i in range(30))
    items_s = "".join(f'<li><a href="/p{i}">word {i} here</a ></li >' for i in range(30))
    a = extract_document(shell.format(filler, items_f).encode())
    b = extract_document(shell.format(filler, items_s).encode())
    assert a.text == b.text and a.spans == b.spans
    # whitespace separators between items
    items_fw = "\n  ".join(f'<li><a href="/p{i}">word {i} here</a></li>' for i in range(10))
    items_sw = "\n  ".join(f'<li><a href="/p{i}">word {i} here</a ></li >' for i in range(10))
    a = extract_document(shell.format(filler, items_fw).encode())
    b = extract_document(shell.format(filler, items_sw).encode())
    assert a.text == b.text and a.spans == b.spans
    # pre context: gaps and separators materialize verbatim both ways
    pre_f = "<pre>" + "<li> <a>alpha beta gamma delta epsilon zeta eta theta</a></li>\n" * 3 + "</pre>"
    pre_s = "<pre>" + "<li> <a>alpha beta gamma delta epsilon zeta eta theta</a ></li >\n" * 3 + "</pre>"
    a = extract_document(shell.format(filler, pre_f).encode())
    b = extract_document(shell.format(filler, pre_s).encode())
    assert a.text == b.text and a.spans == b.spans
    # malformed tail item ends the run without corrupting recovery
    broken = items_f + "<li><a>broken</b>"
    r = extract_document(shell.format(filler, broken).encode())
    assert r.status == "ok" and "content words" in r.text
