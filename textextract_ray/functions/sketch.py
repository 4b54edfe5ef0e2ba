"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference keeps all counts exact (SURVEY.md §2.5: "no sketches
anywhere"); at 10^12 rows a distinct-count over a high-cardinality key
(urls, hosts, content hashes) needs a mergeable sketch: one HLL per
batch inside ``map_batches``, one tiny merge reduce — the shuffle
carries 2^p-byte registers instead of the key universe.

Standard HyperLogLog (Flajolet et al. 2007) with the usual small-range
linear-counting correction; stable hashing (blake2b) so sketches are
deterministic across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 12  # 4096 registers, ~1.6% standard error


def _hash64(values) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
            )
            for v in values
        ],
        dtype=np.uint64,
    )


def hll_create(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add(registers: np.ndarray, values, p: int = DEFAULT_P) -> np.ndarray:
    """Add values; vectorized register update via np.maximum.at."""
    if len(values) == 0:
        return registers
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    ranks = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # exact vectorized count-leading-zeros (binary descent) —
        # float64 log2 misranks values adjacent to powers of two
        v = rest[nz].copy()
        lz = np.zeros(len(v), dtype=np.uint8)
        for s_bits in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - s_bits))
            lz[mask] += s_bits
            v[mask] = v[mask] << np.uint64(s_bits)
        ranks[nz] = lz + 1
    np.maximum.at(registers, idx, ranks)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(registers: np.ndarray, p: int = DEFAULT_P) -> float:
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting for small range
    return float(est)


# --- mergeable quantile sketch (DDSketch-style log binning) ------------------

QUANTILE_ALPHA = 0.005  # relative value-error guarantee


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def quantile_sketch(values: np.ndarray, alpha: float = QUANTILE_ALPHA) -> dict:
    """DDSketch-style quantile sketch (Masson et al., VLDB 2019): each
    value lands in a log-scale bin of relative width ``alpha``; the
    sketch is the per-bin count map. Counts ADD under merge, so the
    sketch is fully mergeable AND insensitive to batch boundaries and
    merge order — the same multiset of values yields the same sketch no
    matter how Ray blocks or schedules the batches (what makes a
    golden-fixture oracle valid, unlike rank-sample summaries whose
    compression depends on the merge tree). Guarantee: the value
    returned for any quantile is within ``alpha`` relative error of the
    true order statistic. Negative values use a mirrored store; values
    with |v| < 1e-9 count as zero."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    lg = np.log(_gamma(alpha))
    out = {"alpha": alpha, "zero": int((np.abs(v) <= 1e-9).sum()), "pos": {}, "neg": {}}
    for sign, store in ((1.0, "pos"), (-1.0, "neg")):
        sv = v[(sign * v) > 1e-9]
        if len(sv) == 0:
            continue
        bins = np.ceil(np.log(sign * sv) / lg).astype(np.int64)
        uniq, counts = np.unique(bins, return_counts=True)
        out[store] = {int(b): int(c) for b, c in zip(uniq, counts)}
    return out


def quantile_sketch_merge(a: dict, b: dict) -> dict:
    assert a["alpha"] == b["alpha"]
    out = {"alpha": a["alpha"], "zero": a["zero"] + b["zero"], "pos": dict(a["pos"]), "neg": dict(a["neg"])}
    for store in ("pos", "neg"):
        for k, c in b[store].items():
            out[store][k] = out[store].get(k, 0) + c
    return out


def quantile_sketch_value(sk: dict, q: float) -> float:
    """Value at quantile ``q`` (0..1; out-of-range q raises). Bins walk
    negative store (descending magnitude) -> zeros -> positive store
    (ascending)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    gamma = _gamma(sk["alpha"])
    total = sk["zero"] + sum(sk["pos"].values()) + sum(sk["neg"].values())
    if total == 0:
        return float("nan")
    target = q * (total - 1)
    acc = 0
    for b in sorted(sk["neg"], reverse=True):
        acc += sk["neg"][b]
        if acc > target:
            return -2.0 * gamma**b / (gamma + 1.0)
    acc += sk["zero"]
    if acc > target and sk["zero"]:
        return 0.0
    for b in sorted(sk["pos"]):
        acc += sk["pos"][b]
        if acc > target:
            return 2.0 * gamma**b / (gamma + 1.0)
    # unreachable for q in [0, 1] (the walk always terminates); kept as
    # a defensive fallback with the store's sign preserved
    if sk["pos"]:
        return 2.0 * gamma ** max(sk["pos"]) / (gamma + 1.0)
    return -2.0 * gamma ** min(sk["neg"]) / (gamma + 1.0)


# --- count-min heavy hitters -------------------------------------------------

CM_WIDTH = 4096
CM_DEPTH = 4


def cm_create(width: int = CM_WIDTH, depth: int = CM_DEPTH) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def cm_add(cm: np.ndarray, values, counts=None) -> np.ndarray:
    """Add values (optionally pre-counted) — vectorized np.add.at per
    row. Counters ADD under merge, so the sketch is batching- and
    order-insensitive (Cormode & Muthukrishnan 2005)."""
    if len(values) == 0:
        return cm
    depth, width = cm.shape
    c = np.ones(len(values), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
    h = _hash64(values)
    for d in range(depth):
        # d-th hash row: mix with an odd constant, stay deterministic
        idx = ((h * np.uint64(2 * d + 1)) >> np.uint64(32)) % np.uint64(width)
        np.add.at(cm[d], idx.astype(np.int64), c)
    return cm


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cm_estimate(cm: np.ndarray, values) -> np.ndarray:
    """Point estimate per value: min over rows (overestimates only)."""
    depth, width = cm.shape
    h = _hash64(values)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = ((h * np.uint64(2 * d + 1)) >> np.uint64(32)) % np.uint64(width)
        est = np.minimum(est, cm[d][idx.astype(np.int64)])
    return est


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970; Kirsch & Mitzenmacher 2006 double hashing)
# ---------------------------------------------------------------------------
#
# Mergeable set-membership for the broadcast side of streaming filters
# (decontamination / denylists / seen-sets) when the reference set
# outgrows an exact sorted-hash array: m bits at k hash functions give
# a tunable false-positive rate with zero false negatives, and two
# blooms over disjoint partitions merge by bitwise OR — so the build
# is one map_batches of partial blooms plus a tiny driver fold, and
# the probe side stays an embarrassingly parallel batch kernel.
# Positions come from Kirsch-Mitzenmacher double hashing
# (h1 + i*h2 mod m), which preserves the asymptotic FPR of k
# independent hashes with two evaluations of the repo-owned
# splitmix64-finalized family — deterministic across processes.


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple:
    """(n_bits, k) sized for ``n_items`` at false-positive rate
    ``fpr``; n_bits is rounded up to a POWER OF TWO so the odd-h2
    double-hash step is coprime to m and every value's k probe
    positions cover the full filter (an odd step modulo a non-power-
    of-two m can land in a reduced coset and inflate the FPR). The
    power-of-two round-up only lowers the realized FPR below target."""
    if n_items <= 0:
        return 64, 1
    ln2 = np.log(2.0)
    n_bits = int(np.ceil(-n_items * np.log(fpr) / (ln2 * ln2)))
    n_bits = max(64, 1 << int(np.ceil(np.log2(n_bits))))
    k = max(1, int(round(n_bits / n_items * ln2)))
    return n_bits, k


def bloom_create(n_bits: int) -> np.ndarray:
    # power of two REQUIRED, not just multiple-of-64: the odd-h2
    # double-hash walk is full-period only when it is coprime to m,
    # which the documented FPR depends on. bloom_params always returns
    # a power of two; direct callers must too.
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two >= 64, got {n_bits}")
    return np.zeros(n_bits // 64, dtype=np.uint64)


def bloom_estimate_items(bloom: np.ndarray, k: int) -> float:
    """Distinct-item estimate from the filter's own occupancy:
    n-hat = -(m/k) * ln(1 - X/m) with X = set bits (Swamidass & Baldi
    2007). Lets a builder detect an undersized filter for free —
    no second pass over the data."""
    m = bloom.size * 64
    x = int(np.bitwise_count(bloom).sum()) if hasattr(np, "bitwise_count") else int(
        np.unpackbits(bloom.view(np.uint8)).sum()
    )
    if x >= m:  # saturated: estimate unbounded
        return float("inf")
    return -(m / k) * float(np.log1p(-x / m))


def _bloom_h12(values) -> tuple:
    """Two independent uint64 hash streams from the repo-owned family.
    Accepts a uint64 ndarray (pre-hashed keys, e.g. n-gram hashes) or
    anything ``hash_utf8`` takes via its string form."""
    from .scalar import _splitmix64, hash_utf8

    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        # any 64-bit-or-narrower integer dtype: reinterpret as uint64
        # (two's-complement-preserving), so an int64 view of the same
        # hashes probes the same positions — no silent string-path
        # detour and no false negatives across dtype views
        v = values.astype(np.uint64)
        h1 = _splitmix64(v ^ np.uint64(0xA076_1D64_78BD_642F))
        h2 = _splitmix64(v ^ np.uint64(0xE703_7ED1_A0B4_28DB))
    else:
        import pyarrow as _pa

        arr = values if isinstance(values, (_pa.Array, _pa.ChunkedArray)) else _pa.array(
            [str(v) for v in values], _pa.string()
        )
        if arr.type != _pa.string():
            arr = arr.cast(_pa.string())
        import pyarrow.compute as _pc

        arr = _pc.fill_null(arr, "None")
        h1 = hash_utf8(arr, seed=0x51ED)
        h2 = hash_utf8(arr, seed=0x2AB9)
    # odd h2: coprime to the power-of-two m from bloom_params, so the
    # k-step walk covers the whole filter (full period)
    return h1, h2 | np.uint64(1)


def bloom_add(bloom: np.ndarray, values, k: int) -> np.ndarray:
    """Set the k positions of every value (in place; returns bloom)."""
    if len(values) == 0:
        return bloom
    n_bits = np.uint64(bloom.size * 64)
    h1, h2 = _bloom_h12(values)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % n_bits
        np.bitwise_or.at(bloom, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bloom


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size != b.size:
        raise ValueError("bloom size mismatch")
    return np.bitwise_or(a, b)


def bloom_contains(bloom: np.ndarray, values, k: int) -> np.ndarray:
    """Vectorized membership probe: bool per value (no false
    negatives; false positives at the configured rate)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    n_bits = np.uint64(bloom.size * 64)
    h1, h2 = _bloom_h12(values)
    out = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % n_bits
        bit = (bloom[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out
