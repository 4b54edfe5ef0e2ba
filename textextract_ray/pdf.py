"""Stdlib-only PDF text extraction (and a deterministic PDF writer).

The north_star requires a real PDF/layout parse stage; this container
has no PDF library, but none is needed for text-bearing PDFs: the
format is public (ISO 32000 / the PDF 1.7 spec), content streams are
zlib (FlateDecode), and text arrives via the ``Tj``/``TJ``/``'``/``"``
operators inside ``BT``..``ET`` blocks. This module implements:

* ``extract_pdf(data) -> ExtractResult`` — walk the object graph
  (trailer /Root -> /Pages -> /Kids -> /Contents), FlateDecode each
  content stream, tokenize it, and assemble text blocks with the same
  span/budget/status semantics as the HTML oracle
  (``oracle.extract_document``). Total — never raises.
* ``build_pdf(text) -> bytes`` — a deterministic single-font writer
  used by datagen and tests. Round-trip guarantee:
  ``extract_pdf(build_pdf(t)).text == t`` for any str ``t`` (paragraph
  structure travels as BT blocks, lines as Td advances, non-latin-1
  text as UTF-16BE hex strings).

Reference parity note: the reference's extraction contract is
"document bytes in -> text + provenance out" (reference
backend/routes/api_routes.py:78-110, src/ocr.py:196-259); this is the
PDF arm of that contract, rebuilt on public format knowledge only.

Parsing rules (pinned, deterministic):
  - one BT..ET block == one output block (span kind "text"); blocks
    join with "\\n\\n" exactly like HTML oracle blocks;
  - ``Td``/``TD`` with ty != 0, ``T*``, ``'`` and ``"`` start a new
    line within the block; ``Tm`` (absolute matrix reset) likewise;
  - ``TJ`` array items: strings append; a numeric kern adjustment
    <= -TJ_SPACE_THRESHOLD inserts one space (the classic extractor
    heuristic: ~the width of a space in thousandths of text space);
  - literal strings decode PDFDocEncoding-as-latin-1 with the eight
    standard escapes + octal; hex strings starting FEFF decode
    UTF-16BE, others latin-1.
"""

from __future__ import annotations

import re
import zlib

from .oracle import DEFAULT_MAX_OUTPUT_BYTES, ExtractResult

TJ_SPACE_THRESHOLD = -180  # thousandths of text-space units

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n")
_TRAILER_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_objects(data: bytes) -> dict:
    """obj_num -> (body, stream_bytes|None). The stream payload is cut
    at the first ``endstream`` that yields a valid zlib inflate when
    /FlateDecode is declared (compressed bytes can contain the literal
    token; retrying successive candidates keeps the walk total)."""
    objects: dict = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            objects[num] = (body, None)
            continue
        head = body[: sm.start()]
        payload_all = data[m.start(3) + sm.end():]
        flate = b"/FlateDecode" in head
        stream: bytes | None = None
        len_m = re.search(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)", head)
        if len_m:  # the direct /Length is authoritative when it validates
            candidate = payload_all[: int(len_m.group(1))]
            if not flate:
                stream = candidate
            else:
                try:
                    zlib.decompress(candidate)
                    stream = candidate
                except zlib.error:
                    stream = None
        if stream is None:
            pos = 0
            for _ in range(8):  # bounded: false 'endstream' hits are rare
                end = payload_all.find(b"endstream", pos)
                if end < 0:
                    break
                # strip at most ONE EOL (the spec's optional pre-token
                # EOL) — compressed payloads legitimately end in \n/\r
                candidate = payload_all[:end]
                if candidate.endswith(b"\r\n"):
                    candidate = candidate[:-2]
                elif candidate.endswith((b"\n", b"\r")):
                    candidate = candidate[:-1]
                if not flate:
                    stream = candidate
                    break
                try:
                    zlib.decompress(candidate)
                    stream = candidate
                    break
                except zlib.error:
                    pos = end + 1
        objects[num] = (head, stream if stream is not None else b"")
    return objects


def _content_objects(data: bytes, objects: dict) -> list:
    """Content-stream object numbers in page order via the document
    graph; fall back to 'every stream that smells like a content
    stream, in object order' when the graph is unwalkable."""
    try:
        root_m = _TRAILER_ROOT_RE.search(data)
        if root_m:
            cat_body, _ = objects[int(root_m.group(1))]
            pages_m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", cat_body)
            pages_body, _ = objects[int(pages_m.group(1))]
            kids_m = re.search(rb"/Kids\s*\[(.*?)\]", pages_body, re.DOTALL)
            out = []
            for kid_m in _REF_RE.finditer(kids_m.group(1)):
                page_body, _ = objects[int(kid_m.group(1))]
                cont_m = re.search(
                    rb"/Contents\s*(\[(?:.*?)\]|\d+\s+\d+\s+R)", page_body, re.DOTALL
                )
                if cont_m:
                    out.extend(int(r.group(1)) for r in _REF_RE.finditer(cont_m.group(1)))
            if out:
                return out
    except (KeyError, AttributeError, TypeError):
        pass
    return [
        n for n in sorted(objects)
        if objects[n][1] is not None and b"BT" in _inflate(objects[n])
    ]


def _inflate(obj: tuple) -> bytes:
    body, stream = obj
    if stream is None:
        return b""
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(stream)
        except zlib.error:
            return b""
    return stream


def _read_literal_string(buf: bytes, i: int) -> tuple:
    """Parse a ( ... ) literal starting at ``i`` (the '('); returns
    (decoded_str, next_index). Handles nesting, the standard escapes,
    octal escapes, and backslash line continuations."""
    out = []
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= buf[j] <= 0x37:
                    j += 1
                out.append(chr(int(buf[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _read_hex_string(buf: bytes, i: int) -> tuple:
    end = buf.find(b">", i)
    if end < 0:
        end = len(buf)
    hx = re.sub(rb"\s", b"", buf[i + 1:end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return "", end + 1
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace"), end + 1
    return raw.decode("latin-1"), end + 1


_WS = b"\x00\t\n\x0c\r "


def _tokenize_content(buf: bytes):
    """Yield ('str', s) | ('num', float) | ('op', bytes) | ('arr_open'/'arr_close', None)."""
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x28:  # (
            s, i = _read_literal_string(buf, i)
            yield ("str", s)
        elif c == 0x3C:  # <
            if i + 1 < n and buf[i + 1] == 0x3C:  # << dict — skip token-wise
                i += 2
                yield ("op", b"<<")
            else:
                s, i = _read_hex_string(buf, i)
                yield ("str", s)
        elif c == 0x3E and i + 1 < n and buf[i + 1] == 0x3E:
            i += 2
            yield ("op", b">>")
        elif c == 0x5B:  # [
            i += 1
            yield ("arr_open", None)
        elif c == 0x5D:  # ]
            i += 1
            yield ("arr_close", None)
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and buf[j] not in _WS and buf[j] not in b"()<>[]/%":
                j += 1
            yield ("name", buf[i:j])
            i = j
        elif c == 0x25:  # % comment to EOL
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _NUM_RE.match(buf, i)
            if m and (48 <= c <= 57 or c in (0x2B, 0x2D, 0x2E)):
                yield ("num", float(m.group(0)))
                i = m.end()
            else:
                j = i
                while j < n and buf[j] not in _WS and buf[j] not in b"()<>[]/%":
                    j += 1
                if j == i:
                    i += 1  # stray delimiter
                    continue
                yield ("op", buf[i:j])
                i = j


def _blocks_from_content(streams: list) -> list:
    """[(block_text, kind)] across all content streams, in order."""
    blocks = []
    for buf in streams:
        lines: list = []
        cur: list = []
        in_text = False
        stack: list = []  # operand stack (strings/nums since last op)
        in_array = False
        array_items: list = []

        def newline():
            lines.append("".join(cur))
            cur.clear()

        for kind, val in _tokenize_content(buf):
            if kind == "arr_open":
                in_array = True
                array_items = []
            elif kind == "arr_close":
                in_array = False
                stack.append(("arr", array_items))
            elif kind in ("str", "num"):
                (array_items if in_array else stack).append((kind, val))
            elif kind == "name":
                if not in_array:
                    stack.append((kind, val))
            elif kind == "op":
                op = val
                if op == b"BT":
                    in_text = True
                    lines, cur = [], []
                elif op == b"ET":
                    if in_text:
                        if cur or lines:
                            newline()
                        blocks.append(("\n".join(lines), "text"))
                    in_text = False
                elif not in_text:
                    stack.clear()
                elif op == b"Tj":
                    if stack and stack[-1][0] == "str":
                        cur.append(stack[-1][1])
                    stack.clear()
                elif op in (b"'", b'"'):
                    # move-to-next-line-and-show: the line break only
                    # separates EXISTING content (same (cur or lines)
                    # guard as Td/T*/Tm) — a block that OPENS with '
                    # must not start with a spurious empty line
                    if cur or lines:
                        newline()
                    if stack and stack[-1][0] == "str":
                        cur.append(stack[-1][1])
                    stack.clear()
                elif op == b"TJ":
                    if stack and stack[-1][0] == "arr":
                        for ik, iv in stack[-1][1]:
                            if ik == "str":
                                cur.append(iv)
                            elif ik == "num" and iv <= TJ_SPACE_THRESHOLD:
                                cur.append(" ")
                    stack.clear()
                elif op in (b"Td", b"TD"):
                    nums = [v for k, v in stack if k == "num"]
                    if len(nums) >= 2 and nums[-1] != 0 and (cur or lines):
                        newline()
                    stack.clear()
                elif op == b"T*":
                    if cur or lines:
                        newline()
                    stack.clear()
                elif op == b"Tm":
                    # an absolute text-matrix reset with content pending
                    # is a new line position (pinned rule)
                    if cur or lines:
                        newline()
                    stack.clear()
                else:
                    stack.clear()
    return blocks


def extract_pdf(
    data: bytes | None,
    max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES,
) -> ExtractResult:
    """Extract text from PDF bytes. Total — never raises.

    Statuses: ok / empty / truncated (budget), plus ``unsupported``
    with the HTML oracle's exact error string when the bytes carry the
    %PDF magic but no parseable text objects — keeping the PDF-routing
    pipeline byte-compatible with the default (oracle) path on the
    garbage-masquerade fixtures.
    """
    try:
        if data is None or not data.startswith(b"%PDF-"):
            return ExtractResult(status="invalid", error="not a pdf: missing %PDF- magic")
        objects = _parse_objects(data)
        streams = [
            _inflate(objects[n])
            for n in _content_objects(data, objects)
            if n in objects
        ]
        streams = [s for s in streams if s]
        if not streams:
            return ExtractResult(status="unsupported", error="non-html payload: pdf")
        blocks = _blocks_from_content(streams)
        if not blocks:
            return ExtractResult(status="unsupported", error="non-html payload: pdf")
        # assembly mirrors oracle.extract_document: "\n\n" joins, spans
        # per block, byte budget with truncated status
        out_parts: list = []
        spans: list = []
        offset = 0
        status = "ok"
        budget = max_output_bytes
        for text, kind in blocks:
            nbytes = len(text.encode("utf-8"))
            sep = 2 if out_parts else 0
            if budget is not None and nbytes + sep > budget:
                status = "truncated"
                break
            if out_parts:
                offset += 2
                if budget is not None:
                    budget -= 2
            out_parts.append(text)
            spans.append({"start": offset, "end": offset + len(text), "kind": kind})
            offset += len(text)
            if budget is not None:
                budget -= nbytes
        if not out_parts:
            return ExtractResult(status="truncated", error="first block exceeds output budget")
        text = "\n\n".join(out_parts)
        if text == "":
            return ExtractResult(status="empty")
        return ExtractResult(text=text, spans=spans, status=status)
    except Exception as exc:  # pragma: no cover — the total-function guarantee
        return ExtractResult(status="parse_error", error=f"{type(exc).__name__}: {exc}")


# --- deterministic writer ----------------------------------------------------

_LIT_SAFE = re.compile(r"[^\\()\n\r\t\b\f]")


def _encode_literal(line: str) -> str | None:
    """Escaped PDF literal-string body for latin-1-safe text, else None."""
    try:
        line.encode("latin-1")
    except UnicodeEncodeError:
        return None
    out = []
    for ch in line:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ord(ch) < 32 or ord(ch) > 126:
            out.append("\\%03o" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def _encode_line_ops(line: str) -> str:
    """Content-stream operators producing exactly ``line`` on parse.

    Long single-spaced lines are emitted as kerned TJ arrays (exercising
    the TJ space heuristic); everything else as one Tj. Non-latin-1
    lines travel as UTF-16BE hex strings."""
    lit = _encode_literal(line)
    if lit is None:
        hx = (b"\xfe\xff" + line.encode("utf-16-be")).hex().upper()
        return f"<{hx}> Tj"
    if len(line) > 40 and " " in line and "  " not in line and line == line.strip():
        runs = [_encode_literal(r) for r in line.split(" ")]
        if all(r is not None for r in runs):
            body = " -200 ".join(f"({r})" for r in runs)
            return f"[{body}] TJ"
    return f"({lit}) Tj"


def build_pdf(text: str, *, paragraphs_per_page: int = 8, creator: str = "textextract-ray") -> bytes:
    """Deterministic text-bearing PDF. ``extract_pdf(build_pdf(t)).text == t``.

    Paragraphs (split on "\\n\\n") become BT blocks; lines (split on
    "\\n") become Td line advances; paragraphs are distributed over
    pages in fixed-size groups (page structure is invisible to the
    extracted text, exactly as in a real document).
    """
    paras = text.split("\n\n")
    page_groups = [
        paras[i:i + paragraphs_per_page]
        for i in range(0, len(paras), paragraphs_per_page)
    ] or [[""]]

    objects: list = []  # (num, body_bytes) later; build streams first
    content_nums = []
    next_num = 4  # 1=catalog 2=pages 3=font; pages + contents follow

    page_nums = []
    for group in page_groups:
        ops = []
        for para in group:
            ops.append("BT /F1 11 Tf 56 770 Td")
            for li, line in enumerate(para.split("\n")):
                if li:
                    ops.append("0 -14 Td")
                ops.append(_encode_line_ops(line))
            ops.append("ET")
        raw = ("\n".join(ops)).encode("latin-1", errors="strict")
        comp = zlib.compress(raw, 9)
        content_num = next_num
        next_num += 1
        page_num = next_num
        next_num += 1
        objects.append(
            (
                content_num,
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp),
            )
        )
        objects.append(
            (
                page_num,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % content_num,
            )
        )
        content_nums.append(content_num)
        page_nums.append(page_num)

    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    fixed = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    all_objects = sorted(fixed + objects)

    buf = bytearray()
    buf += b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets = {}
    for num, body in all_objects:
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num
        buf += body
        buf += b"\nendobj\n"
    xref_at = len(buf)
    count = max(offsets) + 1
    buf += b"xref\n0 %d\n" % count
    buf += b"0000000000 65535 f \n"
    for i in range(1, count):
        buf += b"%010d 00000 n \n" % offsets.get(i, 0)
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (count, xref_at)
    )
    return bytes(buf)
