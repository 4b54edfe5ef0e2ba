"""Pure-stdlib ISO BMFF (MP4) container parser.

The training-data brief's video column needs frame sampling; full frame
*decode* has no stdlib path (no ffmpeg in this container, flagged in
stages/multimodal.py), but the CONTAINER layer — box structure, movie
header, track headers, and the sample tables that map every encoded
frame to its byte range and timestamp — is plain big-endian struct
parsing (ISO/IEC 14496-12, public spec). That is enough to sample real
encoded frames at real container timestamps without a codec, the same
split as the PDF parser (real structure, public format, no external
dep).

Parsed boxes: ftyp, moov/mvhd, trak/tkhd, mdia/mdhd, mdia/hdlr,
stbl/{stts, stsc, stsz, stco, co64}. Unknown boxes are skipped by
size; malformed structure raises ValueError (callers turn that into
status rows, never task crashes).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for sibling boxes in
    data[start:end]; handles 64-bit largesize and size-0 (to-end)."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"box {btype!r} overruns container")
        yield btype, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """Payload range of the first box at the given nested path."""
    for btype, ps, pe in iter_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(data, ps, pe, *path[1:])
    return None


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: str = ""  # vide | soun | ...
    width: float = 0.0
    height: float = 0.0
    timescale: int = 0
    duration: int = 0  # in media timescale units
    sample_sizes: list = field(default_factory=list)
    sample_offsets: list = field(default_factory=list)  # absolute file offsets
    sample_dts: list = field(default_factory=list)  # decode times, timescale units


@dataclass
class Mp4Info:
    major_brand: str = ""
    timescale: int = 0
    duration: int = 0  # movie timescale units
    tracks: list = field(default_factory=list)

    @property
    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) if self.timescale else 0

    def video_track(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _u32s(data: bytes, pos: int, n: int) -> list:
    return list(struct.unpack_from(f">{n}I", data, pos))


def _parse_mvhd(data: bytes, ps: int, pe: int) -> tuple:
    version = data[ps]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, ps + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, ps + 4 + 8)
    return timescale, duration


def _parse_tkhd(data: bytes, ps: int, pe: int) -> tuple:
    version = data[ps]
    if version == 1:
        track_id = struct.unpack_from(">I", data, ps + 4 + 16)[0]
        fixed_at = ps + 4 + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
    else:
        track_id = struct.unpack_from(">I", data, ps + 4 + 8)[0]
        fixed_at = ps + 4 + 8 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
    w, h = struct.unpack_from(">II", data, fixed_at)
    return track_id, w / 65536.0, h / 65536.0  # 16.16 fixed point


def _parse_mdhd(data: bytes, ps: int, pe: int) -> tuple:
    version = data[ps]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, ps + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, ps + 4 + 8)
    return timescale, duration


def _parse_stbl(data: bytes, ps: int, pe: int, track: Mp4Track) -> None:
    stts = stsc = stsz = stco = None
    co64 = False
    for btype, bs, be in iter_boxes(data, ps, pe):
        if btype == b"stts":
            n = struct.unpack_from(">I", data, bs + 4)[0]
            stts = _u32s(data, bs + 8, 2 * n)
        elif btype == b"stsc":
            n = struct.unpack_from(">I", data, bs + 4)[0]
            stsc = _u32s(data, bs + 8, 3 * n)
        elif btype == b"stsz":
            const_size, n = struct.unpack_from(">II", data, bs + 4)
            stsz = [const_size] * n if const_size else _u32s(data, bs + 12, n)
        elif btype == b"stco":
            n = struct.unpack_from(">I", data, bs + 4)[0]
            stco = _u32s(data, bs + 8, n)
        elif btype == b"co64":
            n = struct.unpack_from(">I", data, bs + 4)[0]
            stco = list(struct.unpack_from(f">{n}Q", data, bs + 8))
            co64 = True
    del co64
    if not (stts and stsc and stsz is not None and stco):
        return  # incomplete sample table: metadata-only track
    n_samples = len(stsz)
    track.sample_sizes = stsz

    # expand stsc runs -> samples-per-chunk for each chunk in stco
    spc = []
    entries = [(stsc[i], stsc[i + 1]) for i in range(0, len(stsc), 3)]
    for i, (first_chunk, per) in enumerate(entries):
        last = entries[i + 1][0] - 1 if i + 1 < len(entries) else len(stco)
        spc.extend([per] * (last - first_chunk + 1))
    # absolute offset of each sample: contiguous within its chunk
    offsets = []
    si = 0
    for ci, chunk_off in enumerate(stco):
        off = chunk_off
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n_samples:
                break
            offsets.append(off)
            off += stsz[si]
            si += 1
    track.sample_offsets = offsets[:n_samples]

    # expand stts runs -> per-sample decode timestamps
    dts, t = [], 0
    for i in range(0, len(stts), 2):
        count, delta = stts[i], stts[i + 1]
        for _ in range(count):
            if len(dts) >= n_samples:
                break
            dts.append(t)
            t += delta
    track.sample_dts = dts[:n_samples]


def mp4_parse(payload: bytes) -> Mp4Info:
    """Parse container metadata + sample tables. Raises ValueError on
    structurally invalid input (callers map that to status rows)."""
    if not is_mp4(payload):
        raise ValueError("not an MP4 (no ftyp)")
    info = Mp4Info()
    for btype, ps, pe in iter_boxes(payload):
        if btype == b"ftyp":
            info.major_brand = payload[ps : ps + 4].decode("latin1")
        elif btype == b"moov":
            for mtype, ms, me in iter_boxes(payload, ps, pe):
                if mtype == b"mvhd":
                    info.timescale, info.duration = _parse_mvhd(payload, ms, me)
                elif mtype == b"trak":
                    track = Mp4Track()
                    for ttype, ts, te in iter_boxes(payload, ms, me):
                        if ttype == b"tkhd":
                            track.track_id, track.width, track.height = _parse_tkhd(
                                payload, ts, te
                            )
                        elif ttype == b"mdia":
                            for dtype, ds, de in iter_boxes(payload, ts, te):
                                if dtype == b"mdhd":
                                    track.timescale, track.duration = _parse_mdhd(
                                        payload, ds, de
                                    )
                                elif dtype == b"hdlr":
                                    track.handler = payload[ds + 8 : ds + 12].decode(
                                        "latin1"
                                    )
                                elif dtype == b"minf":
                                    r = _find(payload, ds, de, b"stbl")
                                    if r:
                                        _parse_stbl(payload, r[0], r[1], track)
                    info.tracks.append(track)
    if not info.tracks and info.timescale == 0:
        raise ValueError("no moov box")
    return info


def mp4_video_samples(payload: bytes):
    """(offset, size, ts_ms) per encoded video sample, container order.
    Empty list when there is no video track or no sample table."""
    info = mp4_parse(payload)
    t = info.video_track()
    if t is None or not t.sample_offsets:
        return []
    scale = 1000.0 / t.timescale if t.timescale else 0.0
    return [
        (off, size, int(dts * scale))
        for off, size, dts in zip(t.sample_offsets, t.sample_sizes, t.sample_dts)
    ]
