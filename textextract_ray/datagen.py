"""Deterministic fixture-page generator (FIXTURES.md classes F0-F11).

Produces the BASELINE.json input_hint table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
as Parquet shards. Fully deterministic: page class and host derive from
``doc_id`` arithmetic only; all prose comes from a PRNG seeded with
``SEED ^ doc_id`` so a row's bytes are independent of shard layout and
generation order (FIXTURES.md §6).

Two generation modes:
  * ``generate_pages(...)``: the full 12-class conformance corpus.
  * ``pages_from_documents(...)``: wraps the driver testdata
    ``documents`` table into boilerplate-laden HTML pages whose main
    content is exactly the document text — giving the extraction
    pipeline a DuckDB-expressible oracle (extracted_text == text).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import PAGES_SCHEMA

SEED = 20250824
EPOCH_US = 1_500_000_000_000_000  # 2017-07-14 UTC, fixed base
TS_STEP_US = 61_000_000           # doc_id * 61s (FIXTURES.md §1)
N_HOSTS = 20
LANGS = ("en", "de", "fr", "es", "zz")

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat "
    "duis aute irure reprehenderit voluptate velit esse cillum fugiat nulla "
    "pariatur excepteur sint occaecat cupidatat proident sunt culpa officia "
    "deserunt mollit anim est laborum"
).split()


def page_url(doc_id: int) -> str:
    return f"https://host{doc_id % N_HOSTS}.example/doc/{doc_id}"


def _rng(doc_id: int) -> random.Random:
    return random.Random(SEED ^ (doc_id * 2654435761 % (1 << 61)))


def _sentence(rng: random.Random, nwords: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(nwords)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random, nsent: int | None = None) -> str:
    nsent = nsent or rng.randint(2, 5)
    return " ".join(_sentence(rng, rng.randint(8, 18)) for _ in range(nsent))


def _nav(rng: random.Random, n: int = 8) -> str:
    links = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS).capitalize()}</a></li>'
        for _ in range(n)
    )
    return f"<nav><ul>{links}</ul></nav>"


def _footer(rng: random.Random) -> str:
    links = " ".join(f'<a href="/l{i}">{rng.choice(_WORDS)}</a>' for i in range(6))
    return f"<footer><p>{links}</p><p>&copy; example.org</p></footer>"


def _sidebar(rng: random.Random) -> str:
    links = "".join(f'<li><a href="/s{i}">{_sentence(rng, 3)}</a></li>' for i in range(5))
    return f"<aside><h3>Related</h3><ul>{links}</ul></aside>"


def _article(rng: random.Random, nparas: int, title: str | None = None) -> str:
    body = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(nparas))
    h = f"<h1>{title or _sentence(rng, 5)[:-1]}</h1>" if title is not False else ""
    return f"<article>{h}{body}</article>"


def _shell(title: str, body: str, charset: str = "utf-8") -> str:
    return (
        f'<html><head><meta charset="{charset}"><title>{title}</title>'
        f"<style>body{{margin:0}}</style></head><body>{body}</body></html>"
    )


def make_page(doc_id: int, giant_bytes: int = 1 << 20) -> bytes:
    """Deterministic page bytes for one doc_id; class = doc_id % 12."""
    cls = doc_id % 12
    rng = _rng(doc_id)
    title = _sentence(rng, 4)[:-1]

    if cls == 0:  # simple article
        return _shell(title, _article(rng, rng.randint(3, 10))).encode("utf-8")
    if cls == 1:  # boilerplate-heavy
        body = _nav(rng) + _sidebar(rng) + _article(rng, rng.randint(3, 8)) + _footer(rng)
        return _shell(title, body).encode("utf-8")
    if cls == 2:  # link-farm
        links = "".join(
            f'<li><a href="/x{i}">{_sentence(rng, 4)}</a></li>' for i in range(40)
        )
        return _shell(title, f"<div><ul>{links}</ul></div>").encode("utf-8")
    if cls == 3:  # article + short comments
        comments = "".join(
            f'<div class="c"><p>{_sentence(rng, 2)[:24]}</p></div>' for _ in range(5)
        )
        return _shell(title, _article(rng, rng.randint(3, 6)) + comments).encode("utf-8")
    if cls == 4:  # entities / whitespace torture
        body = (
            "<article><p>Fish &amp; chips &lt;tag&gt; caf&#233; &#228;&nbsp;umlaut "
            "  spaced\r\nout<br>line two of the entity torture paragraph</p>"
            "<pre>  code {\n    indent\t kept\n  }</pre>"
            f"<p>{_paragraph(rng, 3)}</p></article>"
        )
        return _shell(title, body).encode("utf-8")
    if cls == 5:  # malformed html
        body = (
            f"<div><p>{_paragraph(rng, 3)}"
            f"<p>{_paragraph(rng, 2)}</div></div>"
            f"<div class=unquoted data-x=1><p>{_paragraph(rng, 2)}</p>"
        )
        return _shell(title, body).encode("utf-8")
    if cls == 6:  # empty / tiny
        return b"" if doc_id % 24 == 6 else b"<html><p>tiny</p></html>"
    if cls == 7:  # non-utf8 latin-1
        wrong = doc_id % 24 == 19  # declared charset lies on alternating rows
        declared = "utf-8" if wrong else "iso-8859-1"
        body = f"<article><p>Caf\xe9 na\xefve r\xe9sum\xe9 — {_paragraph(rng, 3)}</p></article>"
        page = _shell(title, body, charset=declared)
        return page.encode("latin-1", errors="replace")
    if cls == 8:  # giant doc: article padded with deep nested boilerplate
        art = _article(rng, 6)
        pad_unit = "<div><div><ul>" + "".join(
            f'<li><a href="/p{i}">{rng.choice(_WORDS)}</a></li>' for i in range(20)
        ) + "</ul></div></div>"
        reps = max(1, giant_bytes // len(pad_unit.encode()))
        return _shell(title, pad_unit * (reps // 2) + art + pad_unit * (reps - reps // 2)).encode(
            "utf-8"
        )
    if cls == 9:  # duplicate url: exact copy of a far-away F0 row
        return make_page(_dup_target(doc_id), giant_bytes)
    if cls == 10:  # script/style/comment noise
        body = (
            f"<script>var x = 'leak {rng.choice(_WORDS)}';</script>"
            f"<style>.a {{color: red}}</style><!-- secret comment -->"
            f"<template><p>template leak</p></template>"
            + _article(rng, rng.randint(3, 6))
            + "<script>trailing()</script>"
        )
        return _shell(title, body).encode("utf-8")
    # cls == 11: binary masquerade
    rng2 = _rng(doc_id + 1)
    blob = bytes(rng2.randrange(256) for _ in range(256))
    magic = b"%PDF-1.7\n" if doc_id % 24 == 11 else b"\x89PNG\r\n\x1a\n"
    return magic + blob


def _dup_target(doc_id: int) -> int:
    """F9 rows duplicate an F0 row far enough away to cross shards."""
    return max(0, (doc_id // 24) * 12)


def page_row(doc_id: int, giant_bytes: int = 1 << 20) -> dict:
    cls = doc_id % 12
    src_id = _dup_target(doc_id) if cls == 9 else doc_id
    rng = _rng(src_id + 7)
    return {
        "url": page_url(src_id),
        "warc_ts": EPOCH_US + src_id * TS_STEP_US,
        "html": make_page(doc_id, giant_bytes),
        "text": _sentence(rng, 10),  # raw-crawl placeholder, NOT expected output
        "lang": LANGS[src_id % 5],
    }


def generate_pages(
    out_dir: str,
    n_rows: int,
    n_shards: int,
    giant_bytes: int = 1 << 20,
) -> list:
    """Write `pages-{shard:05d}.parquet` shards; returns the file list.

    Idempotent: fixed row order per shard, fixed writer options
    (FIXTURES.md §6).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + n_shards - 1) // n_shards
    files = []
    for shard in range(n_shards):
        lo, hi = shard * per, min((shard + 1) * per, n_rows)
        rows = [page_row(i, giant_bytes) for i in range(lo, hi)]
        table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression="zstd", row_group_size=4096)
        os.replace(tmp, path)  # a killed generation never leaves a torn shard
        files.append(path)
    return files


# --- pages from the driver `documents` table (SQL-checkable oracle) ----------

def wrap_document_html(doc_id: int, text: str) -> bytes:
    """Wrap one document's text as a boilerplate-laden page whose main
    content is EXACTLY ``text`` — nav/sidebar/footer are link-dense and
    prune away, there are no headings in the article, and the body is a
    single ``<p>`` so extraction round-trips byte-identically.
    """
    rng = _rng(doc_id)
    body = _nav(rng) + f"<article><p>{text}</p></article>" + _footer(rng)
    return _shell(f"doc {doc_id}", body).encode("utf-8")


def documents_to_pages(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents(doc_id, text, lang, ...) -> pages rows."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    return pa.Table.from_pydict(
        {
            "url": [page_url(d) for d in doc_ids],
            "warc_ts": pa.array(
                [EPOCH_US + d * TS_STEP_US for d in doc_ids], pa.timestamp("us", tz="UTC")
            ),
            "html": [wrap_document_html(d, t) for d, t in zip(doc_ids, texts)],
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


def documents_to_pdf_pages(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents -> pages rows whose payload is a
    REAL deterministic PDF carrying exactly the document text (the
    build_pdf/extract_pdf round-trip guarantee makes extraction
    SQL-checkable: extracted_text == documents.text)."""
    from .pdf import build_pdf

    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    return pa.Table.from_pydict(
        {
            "url": [page_url(d) for d in doc_ids],
            "warc_ts": pa.array(
                [EPOCH_US + d * TS_STEP_US for d in doc_ids], pa.timestamp("us", tz="UTC")
            ),
            "html": [build_pdf(t or "") for t in texts],
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


def synthesize_mp4(
    media_id: int,
    *,
    n_samples: int = 24,
    fps: int = 12,
    width: int = 320,
    height: int = 240,
) -> bytes:
    """Deterministic minimal-but-VALID MP4 (ISO BMFF): ftyp + mdat with
    ``n_samples`` encoded-frame stand-ins + a full moov (mvhd, one
    video trak with tkhd/mdhd/hdlr and a complete stts/stsc/stsz/stco
    sample table whose offsets index into this file's mdat). Frame
    payload bytes are seeded by (media_id, sample index) so container
    parsing and frame sampling are testable end-to-end without a
    codec. Structure per ISO/IEC 14496-12 (public spec)."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    def full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
        return box(btype, struct.pack(">B3x", version) + payload)

    rng = random.Random(0xC0DEC ^ media_id)
    samples = [
        bytes(rng.randrange(256) for _ in range(32 + (media_id + i) % 64))
        for i in range(n_samples)
    ]
    mdat_payload = b"".join(samples)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = box(b"mdat", mdat_payload)
    data_start = len(ftyp) + 8  # first sample's absolute file offset

    timescale = fps * 1000
    delta = 1000  # per-sample duration in timescale units -> 1/fps sec
    duration = n_samples * delta

    mvhd = full(
        b"mvhd",
        struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">Hxx", 0x0100)  # volume 1.0 + reserved
        + b"\x00" * 8  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track_id
        + b"\x00" * 4  # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHxx", 0, 0, 0)  # layer, alt_group, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        version=0,
    )
    mdhd = full(
        b"mdhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">Hxx", 0x55C4),  # language 'und'
    )
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"synth\x00")
    stsd = full(
        b"stsd",
        struct.pack(">I", 1)
        # minimal sample entry: size+fourcc+reserved+data_reference_index
        + struct.pack(">I", 16) + b"rle " + b"\x00" * 6 + struct.pack(">H", 1),
    )
    stts = full(b"stts", struct.pack(">III", 1, n_samples, delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n_samples, 1))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = full(b"stco", struct.pack(">II", 1, data_start))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def generate_warc(
    out_dir: str,
    n_rows: int,
    n_shards: int,
    giant_bytes: int = 1 << 20,
) -> list:
    """Write the SAME deterministic page corpus as ``generate_pages``
    but in Common Crawl's native wire format: ``pages-{shard:05d}.warc.gz``
    (one gzip member per WARC response record, HTTP/1.1 payload,
    WARC-Identified-Content-Language carrying the lang column the way
    Common Crawl does). Byte-for-byte the same html per doc_id, so the
    WARC read path can be asserted equal to the parquet read path."""
    import datetime
    import os

    from .warc import http_response_payload, write_warc_gz

    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + n_shards - 1) // n_shards
    files = []
    for shard in range(n_shards):
        lo, hi = shard * per, min((shard + 1) * per, n_rows)
        records = []
        for i in range(lo, hi):
            row = page_row(i, giant_bytes)
            ts = datetime.datetime.fromtimestamp(
                row["warc_ts"] / 1_000_000, tz=datetime.timezone.utc
            )
            headers = {
                "WARC-Type": "response",
                "WARC-Target-URI": row["url"],
                "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "WARC-Record-ID": f"<urn:uuid:doc-{i:012d}>",
                "WARC-Identified-Content-Language": row["lang"],
                "Content-Type": "application/http; msgtype=response",
            }
            records.append((headers, http_response_payload(row["html"])))
        path = os.path.join(out_dir, f"pages-{shard:05d}.warc.gz")
        tmp = path + ".tmp"
        write_warc_gz(tmp, records)
        os.replace(tmp, path)
        files.append(path)
    return files
