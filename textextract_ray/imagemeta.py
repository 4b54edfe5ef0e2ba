"""Pure-stdlib image *header* parsers: real dimensions for JPEG and
GIF without a pixel codec.

The multimodal decode ladder (stages/multimodal.py) is
PIL -> own codec -> stub. PNG gets a full pixel decode
(``textextract_ray.png``); JPEG and GIF pixel decodes need entropy
coders with no stdlib path, but their *metadata* — the only thing
``DecodeImage`` emits — lives entirely in fixed header structures that
32 lines of struct parsing read exactly (JPEG SOF frame headers per
ITU T.81 §B.2.2; the GIF logical screen descriptor per GIF89a §18).

Each parser doubles as the structural probe (the analogue of
``png.has_valid_ihdr``): it returns dimensions ONLY when the byte
stream actually parses as the format's marker/block structure, and
``None`` for magic-prefix-only synthetic payloads — so routing a
payload through these can never misreport junk bytes as real
dimensions, and the deterministic stub path stays reachable for
driver-corpus payloads.

Reference parity: the reference decodes images through PIL
(src/ocr.py:43-60); this is the codec-less container's best-possible
real path for the metadata half of that surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

# SOF0-SOF15 carry the frame header (precision, height, width, ...);
# C4/C8/CC are DHT/JPG/DAC which share the 0xC0 nibble but are not
# frame headers (ITU T.81 table B.1).
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# Standalone markers with no length field: TEM, RST0-7 (SOI handled
# separately; EOI/SOS terminate the scan below).
_STANDALONE = frozenset({0x01}) | frozenset(range(0xD0, 0xD8))


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the first SOF marker of a structurally
    valid JPEG stream, or None when the bytes do not parse as JPEG
    marker structure. Never raises."""
    if not data.startswith(b"\xff\xd8") or len(data) < 4:
        return None
    pos, n = 2, len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            return None
        pos += 1
        # 0xFF fill bytes may pad between segments (T.81 §B.1.1.2)
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            return None
        marker = data[pos]
        pos += 1
        if marker in _STANDALONE or marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        if pos + 2 > n:
            return None
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return None
        if marker in _SOF_MARKERS:
            if seglen < 8:
                return None
            height = int.from_bytes(data[pos + 3 : pos + 5], "big")
            width = int.from_bytes(data[pos + 5 : pos + 7], "big")
            if width == 0 or height == 0:
                return None
            return width, height
        if marker == 0xDA:  # SOS before SOF: not a parseable baseline stream
            return None
        pos += seglen
    return None


def webp_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from a structurally valid WebP RIFF container,
    or None. Covers all three first-chunk layouts: VP8X (extended,
    24-bit canvas minus one), VP8L (lossless, 14-bit packed fields),
    and VP8 (lossy, keyframe start code + 14-bit dims)."""
    if len(data) < 21 or not data.startswith(b"RIFF") or data[8:12] != b"WEBP":
        return None
    riff_len = int.from_bytes(data[4:8], "little")
    if riff_len + 8 > len(data) + 64:  # allow mild padding slack only
        return None
    tag, chunk_len = data[12:16], int.from_bytes(data[16:20], "little")
    body = data[20 : 20 + chunk_len]
    if tag == b"VP8X":
        if chunk_len < 10 or len(body) < 10:
            return None
        width = int.from_bytes(body[4:7], "little") + 1
        height = int.from_bytes(body[7:10], "little") + 1
        return width, height
    if tag == b"VP8L":
        if chunk_len < 5 or len(body) < 5 or body[0] != 0x2F:
            return None
        bits = int.from_bytes(body[1:5], "little")
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        return width, height
    if tag == b"VP8 ":
        if chunk_len < 10 or len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            return None
        width = int.from_bytes(body[6:8], "little") & 0x3FFF
        height = int.from_bytes(body[8:10], "little") & 0x3FFF
        if width == 0 or height == 0:
            return None
        return width, height
    return None


def gif_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the logical screen descriptor of a
    structurally valid GIF, or None. Because the LSD is raw
    little-endian fields (any 13 bytes "parse"), validity additionally
    requires the block that FOLLOWS the descriptor — and the global
    color table when flagged — to start with a legal introducer
    (extension 0x21, image descriptor 0x2C, or trailer 0x3B), which
    magic-prefix-plus-junk payloads fail with probability ~250/256."""
    if not (data.startswith(b"GIF87a") or data.startswith(b"GIF89a")):
        return None
    if len(data) < 14:
        return None
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    if width == 0 or height == 0:
        return None
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 bytes x 2^(size+1)
        pos += 3 * (2 << (flags & 0x07))
    if pos >= len(data) or data[pos] not in (0x21, 0x2C, 0x3B):
        return None
    return width, height
