"""Scalar kernels: versions, date windows, urls, validators.

Rebuilds the reference's scalar computations (SURVEY.md §2.8) as
vectorized functions usable inside ``map_batches`` —
``pyarrow.compute`` where a kernel exists, numpy otherwise. Python
loops only on provably tiny inputs (version strings in a manifest).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- versions (reference update_routes.py:167-183, src/updater.py:168-193) ---

def parse_version(v: str) -> tuple:
    """Strip leading 'v', split on '.', int-cast, zero-pad to 3 parts."""
    v = v.strip().lstrip("vV")
    parts = []
    for p in v.split("."):
        m = re.match(r"\d+", p)
        parts.append(int(m.group(0)) if m else 0)
    while len(parts) < 3:
        parts.append(0)
    return tuple(parts[:3])


def version_gt(a: str, b: str) -> bool:
    """Tuple compare — the reference's is_newer_version."""
    return parse_version(a) > parse_version(b)


def latest_stable(releases: list) -> dict | None:
    """Top-1 stable release: skip draft/prerelease, max by version
    (reference update_routes.py:222-236 iterates newest-first and takes
    the first; we select max explicitly so input order is irrelevant)."""
    stable = [r for r in releases if not r.get("draft") and not r.get("prerelease")]
    if not stable:
        return None
    return max(stable, key=lambda r: parse_version(r.get("tag_name", "0")))


def pick_asset(release: dict, platform_suffix: str) -> dict | None:
    """Platform asset lookup by filename suffix (reference
    update_routes.py:251-263)."""
    for a in release.get("assets", []):
        if a.get("name", "").lower().endswith(platform_suffix.lower()):
            return a
    return None


# --- anchored period windows (reference models.py:183-224) -------------------

def anchored_period(now_ts: np.datetime64, anchor_day: int) -> tuple:
    """[period_start, period_end) anchored on a subscription start
    day-of-month, with month rollover and Jan/Dec edge cases.

    Vector-friendly scalar; used by tests and the metrics bucketing.
    """
    ts = np.datetime64(now_ts, "s").astype("datetime64[D]").astype(object)
    y, m, d = ts.year, ts.month, ts.day
    import calendar
    import datetime as dt

    def clamp(yy: int, mm: int, dd: int) -> dt.date:
        return dt.date(yy, mm, min(dd, calendar.monthrange(yy, mm)[1]))

    # the anchor clamps to the current month's length first (Jan 31 →
    # Feb 28 etc., the rollover edge cases of models.py:199-213)
    effective_anchor = min(anchor_day, calendar.monthrange(y, m)[1])
    if d >= effective_anchor:
        start = clamp(y, m, anchor_day)
        ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
        end = clamp(ny, nm, anchor_day)
    else:
        py, pm = (y - 1, 12) if m == 1 else (y, m - 1)
        start = clamp(py, pm, anchor_day)
        end = clamp(y, m, anchor_day)
    return np.datetime64(start), np.datetime64(end)


def month_bucket(ts_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Assign rows to calendar-month buckets, 'YYYY-MM' (the reference's
    monthly-usage window, models.py:127-160, as a groupable column)."""
    return pc.strftime(ts_col, format="%Y-%m")


def date_bucket(ts_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Daily bucket 'YYYY-MM-DD' (usage_stats (user_id, date) key,
    reference create_tables.sql:37-47)."""
    return pc.strftime(ts_col, format="%Y-%m-%d")


# --- urls / strings ----------------------------------------------------------

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

def url_host(url_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Extract the host from a url column (vectorized; used for
    groupby-host locality)."""
    return pc.replace_substring_regex(url_col, pattern=_HOST_RE + r".*$", replacement=r"\1")


# tracking params stripped by canonicalize_url: utm_* plus the common
# click ids — the standard crawl-pipeline canonicalization set
_TRACKING_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref_src)=[^&#]*"


def canonicalize_url(url_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Crawl-style URL canonicalization, fully vectorized in Arrow
    regex kernels (RE2 — so DuckDB's regexp_replace reproduces every
    step exactly; pinned by a parity pytest):

    1. drop the fragment (``#...``),
    2. lowercase scheme and host (path/query case preserved),
    3. strip the default port (``:80``/``:443``),
    4. remove tracking query params (utm_*, fbclid, gclid, ...),
       tidying the separators they leave behind,
    5. drop a trailing ``?``, collapse duplicate slashes in the path,
    6. drop one trailing slash from a non-root path.

    Two urls that differ only in these respects dedup to the same key;
    used ahead of url-dedup to lift its recall on real crawls. RE2 has
    no lookaround, so the url splits into scheme://host, path, and
    query with anchored regexes and each part canonicalizes
    independently — every step is a plain replace both engines run
    identically. Inputs without a ``scheme://host`` shape (relative
    paths, mailto:, garbage) pass through UNCHANGED — the head/tail
    split would otherwise fall through to the whole string twice and
    emit a doubled nonsense key."""
    absolute = pc.match_substring_regex(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    c = pc.replace_substring_regex(url_col, pattern=r"#.*$", replacement="")
    head = pc.utf8_lower(
        pc.replace_substring_regex(c, pattern=r"^([^:/?#]+://[^/?#]*).*$", replacement=r"\1")
    )
    head = pc.replace_substring_regex(head, pattern=r"^(https://[^/?#:]+):443$", replacement=r"\1")
    head = pc.replace_substring_regex(head, pattern=r"^(http://[^/?#:]+):80$", replacement=r"\1")
    tail = pc.replace_substring_regex(c, pattern=r"^[^:/?#]+://[^/?#]*", replacement="")
    path = pc.replace_substring_regex(tail, pattern=r"\?.*$", replacement="")
    path = pc.replace_substring_regex(path, pattern=r"/{2,}", replacement="/")
    path = pc.replace_substring_regex(path, pattern=r"^(/.+)/$", replacement=r"\1")
    query = pc.replace_substring_regex(tail, pattern=r"^[^?]*", replacement="")
    # '?' → '&' so every param owns its leading separator, strip the
    # tracking params (each match consumes its own '&', so runs of
    # them strip in one pass), restore '?', drop an emptied query
    query = pc.replace_substring_regex(query, pattern=r"^\?", replacement="&")
    query = pc.replace_substring_regex(query, pattern=r"&" + _TRACKING_RE, replacement="")
    query = pc.replace_substring_regex(query, pattern=r"^&", replacement="?")
    query = pc.replace_substring_regex(query, pattern=r"^\?$", replacement="")
    canon = pc.binary_join_element_wise(head, path, query, "")
    return pc.if_else(pc.fill_null(absolute, False), canon, url_col)


EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"

def is_valid_email(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized analogue of the reference's email regex validator
    (auth_routes.py:83-86)."""
    return pc.match_substring_regex(col, EMAIL_RE)


def password_strength_flags(col: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Multi-predicate validator (reference auth_routes.py:52-81):
    length>=8, has upper, lower, digit, special — returned as boolean
    columns so callers can combine/report per-predicate."""
    return pa.table(
        {
            "len_ok": pc.greater_equal(pc.utf8_length(col), 8),
            "has_upper": pc.match_substring_regex(col, "[A-Z]"),
            "has_lower": pc.match_substring_regex(col, "[a-z]"),
            "has_digit": pc.match_substring_regex(col, "[0-9]"),
            "has_special": pc.match_substring_regex(col, r"[^A-Za-z0-9]"),
        }
    )


# --- misc scalar kernels (SURVEY.md §2.8) ------------------------------------

def iso_parse(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ISO-8601 parse with the Z→+00:00 fixup (reference
    api_routes.py:48, models.py:186) — vectorized; returns
    timestamp[us, UTC]."""
    fixed = pc.replace_substring_regex(col, pattern="Z$", replacement="+00:00")
    return pc.strptime(fixed, format="%Y-%m-%dT%H:%M:%S%z", unit="us")


def epoch_to_ts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Epoch seconds → timestamp (reference stripe_routes.py:134-135)."""
    return pc.multiply(col.cast(pa.int64()), 1_000_000).cast(pa.timestamp("us", tz="UTC"))


def bytes_to_mb(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Size math MB (reference updater.py:589)."""
    return pc.divide(col.cast(pa.float64()), 1024.0 * 1024.0)


def percent(done, total) -> pa.Array:
    """Percent progress with zero-guard (reference updater.py:614)."""
    t = pc.max_element_wise(total.cast(pa.float64()), 1.0)
    return pc.multiply(pc.divide(done.cast(pa.float64()), t), 100.0)


def price_tier(amount_col: pa.ChunkedArray | pa.Array, tiers: list) -> pa.Array:
    """and/or-chain price-tier ladder (reference stripe_routes.py:79)
    as a vectorized bucket lookup: tiers = [(threshold, label), ...]
    sorted ascending; first tier whose threshold >= amount wins."""
    import numpy as np

    amounts = amount_col.cast(pa.float64()).to_numpy(zero_copy_only=False)
    thresholds = np.array([t for t, _ in tiers], dtype=np.float64)
    labels = np.array([l for _, l in tiers] + ["over"], dtype=object)
    idx = np.searchsorted(thresholds, amounts, side="left")
    return pa.array(labels[idx], pa.string())


def stable_bucket(values, num_buckets: int) -> "np.ndarray":
    """THE bucket hash for every hash-partition step in this engine
    (url dedup, layout pass, LSH coarse buckets, host locality):
    ``stable_hash64(values) % num_buckets`` as int32 — one shared hash
    definition, so the url-hash LAYOUT (partition_pages_by_url) and the
    url-hash DEDUP (dedup_by_url) can never drift apart.

    Accepts a pyarrow Array/ChunkedArray (fast path: vectorized hash,
    no to_pylist) or any Python sequence; see stable_hash64 for the
    exact normalization each path applies (STRING columns hash
    identically on both paths; non-string scalars normalize via Arrow
    cast on the Arrow path and repr() on the sequence path — bucket a
    non-string column through ONE path only).

    Migration note (round 2): was per-row zlib.crc32; replaced with the
    C-vectorized hash for the bucketing hot paths. Bucket ASSIGNMENTS
    changed; no persisted state depends on them (the seen-url index is
    rebuilt from manifests per session, layouts are per-run)."""
    h = stable_hash64(values)
    if len(h) == 0:
        return np.empty(0, dtype=np.int32)
    return (h % np.uint64(num_buckets)).astype(np.int32)


# --- self-owned vectorized 64-bit string hash --------------------------------
#
# The engine-wide "stable" hash family used to delegate to polars
# Series.hash, which polars documents as NOT stable across polars
# versions — an upgrade would silently invalidate every golden fixture
# and cross-run-determinism guarantee keyed to these hashes. This
# family (byte-polynomial mod 2^64 + length mix + splitmix64 finalize)
# is defined entirely by this repo and can never change underneath the
# goldens. All arithmetic is vectorized numpy uint64 with natural
# modular wraparound, operating directly on the Arrow flat UTF-8
# buffer — no per-string Python loop.

_POLY_M = np.uint64(0x100000001B3)  # FNV-64 prime (any odd multiplier works)
_LEN_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """splitmix64 finalizer (Steele et al. 2014, public domain
    algorithm) — full-avalanche mix so low bits are bucket-safe."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_utf8(arr, seed: int = 0) -> "np.ndarray":
    """uint64 hash per string of an Arrow string array (no nulls —
    callers fill first). Horner over 8-byte little-endian words
    (h = h·M + word), then splitmix64(h ^ len·C ^ mix(seed)); the
    length term separates strings equal up to trailing NULs.

    Vectorized across strings per WORD position, not per byte: the
    loop runs max(⌈len/8⌉) times with only the still-unfinished
    strings active, so transients are O(active·8 B) per step — short
    strings (tokens, urls, keys: the engine's inputs) finish in 1-3
    steps and total transient allocation stays a small multiple of the
    input bytes. (A per-byte positional-weight expansion was 40 B of
    fresh pages per input byte — measured 80× slower than this shape
    on the sandbox's slow-first-touch memory.)"""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # binary columns hash byte-identically to the equivalent string
    # (same offsets+data buffer layout) WITHOUT a utf8-validating cast
    # that would reject arbitrary crawl bytes (html payloads)
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())  # int64 offsets
    else:
        arr = arr.cast(pa.large_string())  # int64 offsets
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    sm_seed = _splitmix64(np.array([seed], dtype=np.uint64))[0]

    h = np.zeros(n, dtype=np.uint64)
    active = np.nonzero(lens > 0)[0]
    k = 0
    j8 = np.arange(8, dtype=np.int64)
    shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64))[None, :]
    while len(active):
        pos = starts[active] + 8 * k
        nb = np.minimum(lens[active] - 8 * k, 8)
        idx8 = np.minimum(pos[:, None] + j8[None, :], max(len(data) - 1, 0))
        byts = data[idx8].astype(np.uint64)
        byts &= np.where(j8[None, :] < nb[:, None], np.uint64(0xFF), np.uint64(0))
        word = (byts << shifts).sum(axis=1, dtype=np.uint64)
        h[active] = h[active] * _POLY_M + word
        k += 1
        active = active[lens[active] > 8 * k]
    return _splitmix64(h ^ (lens.astype(np.uint64) * _LEN_MIX) ^ sm_seed)


def stable_hash64(values) -> "np.ndarray":
    """Full-width member of the same hash family as ``stable_bucket``
    (identical self-owned hash, seed 0 — see ``hash_utf8``): uint64 per
    value. Used where a compact row identity must travel INSTEAD of the
    row itself (e.g. the dedup dup-key scan ships 8 bytes/url, not the
    url). Collisions are allowed to be resolved downstream on the real
    key — callers must treat a hash hit as a candidate, not a
    verdict."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if len(values) == 0:
            return np.empty(0, dtype=np.uint64)
        arr = values.cast(pa.string()) if values.type != pa.string() else values
        arr = pc.fill_null(arr, "None")
    else:
        vals = list(values)
        if not vals:
            return np.empty(0, dtype=np.uint64)
        arr = pa.array(
            [v if isinstance(v, str) else repr(v) for v in vals], pa.string()
        )
    return hash_utf8(arr, seed=0)


# Back-compat alias for the pre-round-2 name; same contract.
crc32_bucket = stable_bucket


def surt_host_key(url_col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """SURT-style reversed-host sort key ("www.example.com" →
    "com,example,www") — the Common Crawl / web-archive convention
    (Sort-friendly URI Reordering Transform): sorting or
    range-partitioning by this key co-locates a registrable domain
    with all its subdomains, the locality a politeness-aware or
    per-site stage wants. Lowercased; credentials and port stripped;
    non-url rows key as their lowercased whole string.

    Fully vectorized: host extraction and cleanup are RE2 kernels, the
    label reversal is one numpy permutation over the flattened
    split-by-dot labels (no Python per row)."""
    host = url_host(url_col)
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    host = pc.utf8_lower(pc.fill_null(host, ""))
    # strip userinfo and port ("user:pw@h.com:8080" -> "h.com")
    host = pc.replace_substring_regex(host, pattern=r"^[^@]*@", replacement="")
    host = pc.replace_substring_regex(host, pattern=r":\d+$", replacement="")
    parts = pc.split_pattern(host, ".")
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    n_rows = len(host)
    counts = np.bincount(parents, minlength=n_rows) if len(parents) else np.zeros(n_rows, np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    # position i maps to its mirror within the same parent's segment
    idx = np.arange(len(parents), dtype=np.int64)
    perm = starts[parents] + (ends[parents] - 1 - idx)
    reversed_flat = flat.take(pa.array(perm, pa.int64()))
    offsets = np.concatenate(([0], ends)).astype(np.int32)
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets), reversed_flat)
    return pc.binary_join(rebuilt, ",")
