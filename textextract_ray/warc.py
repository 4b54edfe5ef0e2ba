"""Pure-stdlib WARC/1.0 reader + writer (ISO 28500) — Common Crawl's
native wire format.

The north-rule input is a Common-Crawl-style pages table; crawls ship
as ``.warc.gz``: concatenated gzip members, one WARC record each, a
record being ``WARC/1.0\\r\\n`` + header block + blank line +
``Content-Length`` payload bytes + ``\\r\\n\\r\\n``. A ``response``
record's payload is a raw HTTP/1.1 response (status line + headers +
body). Python's gzip handles multi-member streams natively, so a full
reader needs only record framing and a minimal HTTP split — no
external deps, same spirit as the PDF/PNG/MP4 parsers.

Reader semantics: streaming (record-at-a-time, bounded memory per
record), tolerant of trailing garbage after the last member (raise on
mid-stream corruption), ``response`` records only for page extraction
(request/metadata records are skipped by type).
"""

from __future__ import annotations

import gzip
import io

CRLF = b"\r\n"


def _read_headers(fp) -> dict | None:
    """Read one CRLF-terminated header block. Returns None at EOF."""
    line = fp.readline()
    while line in (CRLF, b"\n"):  # skip inter-record blank lines
        line = fp.readline()
    if not line:
        return None
    version = line.rstrip()
    if not version.startswith(b"WARC/"):
        raise ValueError(f"bad WARC version line: {version[:40]!r}")
    headers = {"WARC-Version": version.decode("latin1")}
    while True:
        line = fp.readline()
        if not line:
            raise ValueError("truncated WARC header block")
        if line in (CRLF, b"\n"):
            return headers
        if b":" not in line:
            raise ValueError(f"malformed WARC header: {line[:40]!r}")
        k, v = line.split(b":", 1)
        headers[k.decode("latin1").strip()] = v.decode("latin1").strip()


def iter_warc_records(stream):
    """Yield (headers: dict, payload: bytes) per record from a binary
    stream of raw WARC (already-decompressed) bytes."""
    fp = stream if hasattr(stream, "readline") else io.BytesIO(stream)
    while True:
        headers = _read_headers(fp)
        if headers is None:
            return
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        payload = fp.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield headers, payload


def iter_warc_gz(path_or_stream):
    """Yield records from a ``.warc.gz`` (multi-member gzip) file path,
    binary file object, or raw bytes. File objects (including pyarrow
    NativeFiles from an object-store filesystem) decompress STREAMING —
    gzip reads from the handle record-at-a-time, so worker heap stays
    bounded by one record, never one archive."""
    if isinstance(path_or_stream, bytes) and path_or_stream[:2] == b"\x1f\x8b":
        path_or_stream = io.BytesIO(path_or_stream)
    # str/bytes path OR file object: gzip.open handles both (an existing
    # file object streams; it is NOT read fully first)
    with gzip.open(path_or_stream, "rb") as fp:
        yield from iter_warc_records(fp)


def parse_http_response(payload: bytes) -> tuple:
    """(status_code, headers dict, body bytes) from a raw HTTP/1.1
    response payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP payload without header terminator")
    head = payload[:sep].split(CRLF)
    status_line = head[0].split(b" ", 2)
    if len(status_line) < 2 or not status_line[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line: {head[0][:40]!r}")
    code = int(status_line[1])
    headers = {}
    for line in head[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin1").strip().lower()] = v.decode(
                "latin1"
            ).strip()
    return code, headers, payload[sep + 4 :]


# --- writer (fixture synthesis + round-trip tests) ----------------------------


def write_warc_gz(path: str, records) -> None:
    """Write ``records`` = iterable of (warc_headers dict, payload
    bytes) as one gzip member per record (the Common Crawl layout, so
    readers can seek member boundaries)."""
    with open(path, "wb") as out:
        for headers, payload in records:
            buf = io.BytesIO()
            buf.write(headers.get("WARC-Version", "WARC/1.0").encode() + CRLF)
            for k, v in headers.items():
                if k == "WARC-Version":
                    continue
                buf.write(f"{k}: {v}".encode("latin1") + CRLF)
            buf.write(f"Content-Length: {len(payload)}".encode() + CRLF)
            buf.write(CRLF)
            buf.write(payload)
            buf.write(CRLF + CRLF)
            out.write(gzip.compress(buf.getvalue(), mtime=0))


def http_response_payload(body: bytes, content_type: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK" + CRLF
        + f"Content-Type: {content_type}".encode() + CRLF
        + f"Content-Length: {len(body)}".encode() + CRLF
        + CRLF
        + body
    )
