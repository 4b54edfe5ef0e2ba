"""Tests for the stdlib PDF writer/parser and the PDF extraction arm.

Round-trip guarantee, operator coverage (Tj/TJ/'/Td/T*/Tm, literal +
hex strings, escapes, multi-page), failure totality, and pipeline
byte-identity with the pure function.
"""

import random

import pytest

from textextract_ray.pdf import TJ_SPACE_THRESHOLD, build_pdf, extract_pdf


def test_round_trip_basics():
    for t in [
        "hello world",
        "line one\nline two",
        "para one\n\npara two\n\npara three",
        "unicode: café — 日本語 ¥€",
        "escapes: (nested (parens)) \\back\\slash\\ tab\there",
        "trailing structure\n\n\n\nkept\n\n",
        "x" * 2000,
    ]:
        res = extract_pdf(build_pdf(t))
        assert res.status == "ok"
        assert res.text == t


def test_round_trip_fuzz():
    rng = random.Random(13)
    alphabet = list("abc ()\\\n\t\r") + ["é", "日", "\x00", "\x7f", "\n\n", "  ", "\\n", "\f"]
    for _ in range(300):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 160)))
        res = extract_pdf(build_pdf(t))
        if t == "":
            assert res.status == "empty"
        else:
            assert res.text == t, repr(t)


def test_multipage_structure():
    paras = [f"paragraph number {i} with several words" for i in range(25)]
    t = "\n\n".join(paras)
    pdf = build_pdf(t, paragraphs_per_page=4)
    assert pdf.count(b"/Type /Page ") == 7  # ceil(25/4) pages
    res = extract_pdf(pdf)
    assert res.text == t
    assert len(res.spans) == 25
    # spans index into the text exactly
    for s, p in zip(res.spans, paras):
        assert res.text[s["start"]:s["end"]] == p


def test_spans_and_budget_truncation():
    t = "block one is here\n\nblock two follows"
    r = extract_pdf(build_pdf(t), max_output_bytes=20)
    assert r.status == "truncated"
    assert r.text == "block one is here"
    assert r.spans == [{"start": 0, "end": 17, "kind": "text"}]
    r2 = extract_pdf(build_pdf(t), max_output_bytes=2)
    assert r2.status == "truncated" and r2.text == ""


def test_tj_kerning_heuristic():
    # a long single-spaced line goes through the TJ path — verify the
    # writer actually produced a TJ array and the space is rebuilt
    t = "a long line with single spaces that should take the kerned array path"
    pdf = build_pdf(t)
    import zlib

    raw = b"".join(
        zlib.decompress(c) for c in _content_streams(pdf)
    )
    assert b"TJ" in raw
    assert extract_pdf(pdf).text == t


def _content_streams(pdf: bytes):
    from textextract_ray.pdf import _content_objects, _parse_objects

    objs = _parse_objects(pdf)
    return [objs[n][1] for n in _content_objects(pdf, objs)]


def test_quote_and_tstar_operators():
    # hand-written content stream exercising ' and T* and Tm
    import zlib

    content = (
        b"BT /F1 11 Tf 56 770 Td (first) Tj (second) ' T* (third) Tj "
        b"1 0 0 1 56 700 Tm (fourth) Tj ET"
    )
    comp = zlib.compress(content)
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%%%EOF\n" % (len(comp), comp)
    )
    res = extract_pdf(pdf)
    # ' starts a new line then writes; T* new line; Tm with changed ty
    assert res.text == "first\nsecond\nthird\nfourth"


def test_uncompressed_stream_and_graph_fallback():
    # no /Filter, no /Root — parser falls back to any BT-bearing stream
    content = b"BT (plain stream text) Tj ET"
    pdf = (
        b"%%PDF-1.4\n"
        b"7 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"%%%%EOF\n" % (len(content), content)
    )
    assert extract_pdf(pdf).text == "plain stream text"


def test_totality_on_garbage():
    rng = random.Random(3)
    for _ in range(50):
        blob = b"%PDF-1.7\n" + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 512)))
        res = extract_pdf(blob)
        assert res.status in ("unsupported", "parse_error")
    assert extract_pdf(None).status == "invalid"
    assert extract_pdf(b"<html>x</html>").status == "invalid"
    assert extract_pdf(b"").status == "invalid"


def test_tj_threshold_boundary():
    import zlib

    def mini(content: bytes) -> bytes:
        comp = zlib.compress(content)
        return (
            b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\n"
            b"stream\n%s\nendstream\nendobj\n" % (len(comp), comp)
        )

    at = mini(b"BT [(a) %d (b)] TJ ET" % int(TJ_SPACE_THRESHOLD))
    under = mini(b"BT [(a) %d (b)] TJ ET" % int(TJ_SPACE_THRESHOLD + 1))
    assert extract_pdf(at).text == "a b"
    assert extract_pdf(under).text == "ab"


def test_pipeline_matches_pure_function(ray_session):
    """The PdfExtract actor-pool output is byte-identical to the pure
    extract_pdf over the same synthesized PDFs (north_rule invariant,
    PDF arm)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from textextract_ray.datagen import documents_to_pdf_pages, page_url
    from textextract_ray.stages.extract import PdfExtract

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    ).slice(0, 60)
    pages = documents_to_pdf_pages(docs)
    out = (
        rd.from_arrow(pages)
        .map_batches(
            PdfExtract,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=16,
            concurrency=2,
            fn_constructor_kwargs={"strict": True},
        )
        .to_pandas()
        .set_index("url")
    )
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        row = out.loc[page_url(doc_id)]
        pure = extract_pdf(pages.filter(
            __import__("pyarrow").compute.equal(pages["url"], page_url(doc_id))
        )["html"][0].as_py())
        assert row["extracted_text"] == text == pure.text
        assert row["status"] == "ok" == pure.status


def test_quote_operator_opening_a_block_adds_no_leading_blank_line():
    # foreign emitter pattern: ' (move-next-line-and-show) as the FIRST
    # op of a BT block — must not produce a leading empty line
    from textextract_ray.pdf import extract_pdf

    content = b"BT (alpha) ' (beta) ' ET"
    import zlib

    comp = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
        b"4 0 obj<</Length " + str(len(comp)).encode() + b"/Filter/FlateDecode>>stream\n"
        + comp
        + b"\nendstream endobj\n"
        b"trailer<</Root 1 0 R>>\n%%EOF"
    )
    res = extract_pdf(pdf)
    assert res.status == "ok"
    assert res.text == "alpha\nbeta"
