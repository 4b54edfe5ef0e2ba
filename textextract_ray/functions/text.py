"""Text-analysis + dedup primitives for training-data pipelines.

Language-ID (marker-n-gram heuristic), quality scoring, token counting,
document fingerprinting, shingling, MinHash, SimHash. All kernels are
batch-level (Arrow/pandas/numpy in, Arrow out) so they drop into
``map_batches``; hashing uses stable hash functions only (md5 for
content fingerprints, the repo-owned stable hash via ``_flat_token_hashes``
for the sketch family) — never Python's salted ``hash()`` — so results are
identical across Ray worker processes (the byte-identity discipline of
the extraction oracle applied to sketches).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting ----------------------------------------------------------

def token_count(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count (count of non-whitespace runs), fully
    vectorized in Arrow; 0 for empty/whitespace-only strings.

    Pinned semantics: ASCII whitespace only (space, \\t, \\n, \\r,
    \\f — RE2's ``\\s``). Unicode spaces (NBSP, U+2028, ...) count as
    token characters, unlike Python's ``str.split()``."""
    return pc.count_substring_regex(col, r"\S+")


# re.ASCII pins \s to [ \t\n\r\f\v] so Unicode whitespace (NBSP, ...)
# counts as punctuation here, matching the RE2 [:space:] oracle exactly.
_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]", re.ASCII)

def bpeish_token_count(texts: list) -> np.ndarray:
    """BPE-ish token proxy: letter runs + single digits + punctuation
    marks each count once (a public GPT-2-style pre-tokenizer shape)."""
    return np.fromiter(
        (len(_BPE_ISH.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )


# --- fingerprints ------------------------------------------------------------

def md5_hex(texts: list) -> list:
    """Content fingerprint as hex md5 — byte-parity with DuckDB md5()."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def rolling_fingerprint(texts: list, window: int = 4, base: int = 1_000_003) -> np.ndarray:
    """Rolling polynomial hash over whitespace tokens: the min of all
    ``window``-gram hashes (a winnowing-style document fingerprint,
    Schleimer et al. SIGMOD 2003). Token hashing is one shared C pass
    (``_flat_token_hashes``, the repo-owned stable hash — was a
    per-token crc32 Python loop); the windowed combine is ``window``
    vector ops per doc."""
    h, offs = _flat_token_hashes(texts)
    out = np.empty(len(texts), dtype=np.uint64)
    mod = np.uint64((1 << 61) - 1)
    b = np.uint64(base)
    for i in range(len(texts)):
        hs = h[offs[i] : offs[i + 1]] % mod
        n = len(hs)
        if n == 0:
            out[i] = 0
            continue
        w = min(window, n)
        acc = np.zeros(n - w + 1, dtype=np.uint64)
        for k in range(w):
            acc = (acc * b + hs[k : k + len(acc)]) % mod
        out[i] = acc.min()
    return out


# --- language ID (marker-word / script heuristic) ----------------------------

_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu|für)\b|[äöüß]",
    "fr": r"\b(le|la|les|et|est|une?|des|du|dans|pour|que)\b|[éèêàçù]",
    "es": r"\b(el|la|los|las|y|es|una?|del|en|que|por|para)\b|[ñ¿¡]|ción\b",
}
_CJK = r"[一-鿿]"


def lang_id(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Heuristic language ID: vectorized marker-pattern counts per
    language, CJK-script override, argmax; 'und' when nothing matches
    (nulls count as empty → 'und'). One Arrow regex pass per language —
    no per-row Python."""
    col = pc.fill_null(col, "")
    lower = pc.utf8_lower(col)
    n = len(lower)
    scores = np.zeros((len(_LANG_MARKERS), n), dtype=np.int64)
    langs = list(_LANG_MARKERS)
    for i, lang in enumerate(langs):
        scores[i] = pc.count_substring_regex(lower, _LANG_MARKERS[lang]).to_numpy(
            zero_copy_only=False
        )
    cjk = pc.count_substring_regex(col, _CJK).to_numpy(zero_copy_only=False)
    best = scores.argmax(axis=0)
    best_score = scores.max(axis=0)
    out = np.array(langs, dtype=object)[best]
    out[best_score == 0] = "und"
    out[cjk > (best_score * 2)] = "zh"
    return pa.array(out, pa.string())


# --- quality scoring ---------------------------------------------------------

_STOPWORDS_RE = r"\b(the|and|of|to|in|a|is|that|for|with)\b"

def quality_features(col: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Gopher/C4-style quality signals, fully vectorized:
    n_chars, n_tokens, mean_token_len, stop_ratio, punct_ratio,
    upper_ratio, and a composite quality_score in [0, 1]."""
    n_chars = pc.utf8_length(col).cast(pa.float64())
    # THE engine token definition (token_count: \S+ runs) — NOT
    # utf8_split_whitespace, which emits empty boundary tokens and
    # diverges from both token_stats and the RE2 SQL oracle
    n_tokens = token_count(col).cast(pa.float64())
    safe_tokens = pc.max_element_wise(n_tokens, 1.0)
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    # mean token length = (chars - spaces) / tokens
    n_spaces = pc.count_substring_regex(col, r"\s").cast(pa.float64())
    mean_tok = pc.divide(pc.subtract(n_chars, n_spaces), safe_tokens)
    stop = pc.count_substring_regex(pc.utf8_lower(col), _STOPWORDS_RE).cast(pa.float64())
    stop_ratio = pc.divide(stop, safe_tokens)
    punct = pc.count_substring_regex(col, r"[^\w\s]").cast(pa.float64())
    punct_ratio = pc.divide(punct, safe_chars)
    upper = pc.count_substring_regex(col, r"[A-Z]").cast(pa.float64())
    upper_ratio = pc.divide(upper, safe_chars)

    nc = n_chars.to_numpy(zero_copy_only=False)
    mt = mean_tok.to_numpy(zero_copy_only=False)
    sr = stop_ratio.to_numpy(zero_copy_only=False)
    pr = punct_ratio.to_numpy(zero_copy_only=False)
    ur = upper_ratio.to_numpy(zero_copy_only=False)
    score = (
        np.clip(nc / 500.0, 0, 1) * 0.25              # enough text
        + ((mt >= 3) & (mt <= 10)).astype(np.float64) * 0.25  # plausible word lengths
        + np.clip(sr / 0.2, 0, 1) * 0.25               # natural-language stopword rate
        + (1.0 - np.clip(pr / 0.3, 0, 1)) * 0.15       # not symbol soup
        + (1.0 - np.clip(ur / 0.3, 0, 1)) * 0.10       # not shouting
    )
    return pa.table(
        {
            "n_chars": n_chars.cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
            "mean_token_len": mean_tok,
            "stop_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "quality_score": pa.array(score, pa.float64()),
        }
    )


def repetition_features(texts: list) -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, arXiv:2112.11446, table A1 filters — public paper): for
    n ∈ (2, 3, 4) the fraction of n-gram occurrences that repeat an
    earlier occurrence (``dup_{n}gram_frac``), plus the share of all
    bigram occurrences taken by the single most frequent bigram
    (``top_bigram_frac``). Repetitive boilerplate/spam scores high;
    clean prose is near 0. One shared token-hash pass feeds all three
    n-gram sizes (hash-based: a 2^-64 collision folds two n-grams
    together — irrelevant at filter precision). Docs with fewer than
    n tokens score 0 for that n."""
    h, offs = _flat_token_hashes(texts)
    n_docs = len(texts)
    feats = {n: np.zeros(n_docs, dtype=np.float64) for n in (2, 3, 4)}
    top_bi = np.zeros(n_docs, dtype=np.float64)
    for d in range(n_docs):
        hd = h[offs[d] : offs[d + 1]]
        for n in (2, 3, 4):
            m = len(hd) - n + 1
            if m < 1:
                continue
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                acc = acc * _SHINGLE_B + hd[j : j + m]
            uniq, counts = np.unique(acc, return_counts=True)
            feats[n][d] = 1.0 - len(uniq) / m
            if n == 2:
                top_bi[d] = counts.max() / m
    return pa.table(
        {
            "dup_2gram_frac": pa.array(feats[2], pa.float64()),
            "dup_3gram_frac": pa.array(feats[3], pa.float64()),
            "dup_4gram_frac": pa.array(feats[4], pa.float64()),
            "top_bigram_frac": pa.array(top_bi, pa.float64()),
        }
    )


def ngram_hash_sets(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-document DISTINCT n-gram hash sets from the shared token-hash
    pass (same rolling polynomial as ``repetition_features``, so one
    hash family covers repetition AND contamination checks). Returns
    (flat uint64 hash array, int64 offsets) with doc d's sorted unique
    hashes at ``flat[offs[d]:offs[d+1]]``; a doc with fewer than n
    tokens owns an empty slice. Hash-based: a 2^-64 collision folds two
    n-grams together (the same accepted trade as the SQL oracles
    document)."""
    h, offs = _flat_token_hashes(texts)
    chunks, out_offs = [], np.zeros(len(texts) + 1, dtype=np.int64)
    for d in range(len(texts)):
        hd = h[offs[d] : offs[d + 1]]
        m = len(hd) - n + 1
        if m < 1:
            out_offs[d + 1] = out_offs[d]
            continue
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            acc = acc * _SHINGLE_B + hd[j : j + m]
        u = np.unique(acc)
        chunks.append(u)
        out_offs[d + 1] = out_offs[d] + len(u)
    flat = (
        np.concatenate(chunks) if chunks else np.array([], dtype=np.uint64)
    )
    return flat, out_offs


# --- PII scrubbing -----------------------------------------------------------

# Order is load-bearing: each pattern is counted+replaced on the text
# as scrubbed so far, and the broad phone pattern would otherwise eat
# SSN-shaped and dotted-IP digit runs.
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn_like", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d"),
)


def scrub_pii(col: pa.ChunkedArray | pa.Array) -> pa.Table:
    """PII redaction for training corpora: emails, SSN-shaped ids,
    IPv4 addresses, phone-shaped digit runs each replaced by a typed
    placeholder (``<EMAIL>``, ...), with a per-type match count per
    document. Entirely Arrow RE2 kernels (count + replace per type) —
    no per-row Python. Heuristic by design: a recall-oriented scrub
    for corpus hygiene, not a compliance guarantee."""
    scrubbed = pc.fill_null(col, "")
    out_counts = {}
    for name, pat in _PII_PATTERNS:
        out_counts[f"n_{name}"] = pc.count_substring_regex(scrubbed, pat).cast(
            pa.int64()
        )
        scrubbed = pc.replace_substring_regex(
            scrubbed, pat, f"<{name.upper()}>"
        )
    return pa.table({"text_scrubbed": scrubbed, **out_counts})


# --- shingles / MinHash / SimHash -------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


_SHINGLE_B = np.uint64(1_000_003)


def _flat_token_hashes(texts: list):
    """One vectorized hash pass over every whitespace token of every
    doc in the batch (self-owned repo-stable hash, fixed seed 41 — see
    functions.scalar.hash_utf8). Returns (flat uint64 hashes, doc
    offsets) — the shared front-end for the shingle / simhash /
    rolling-fingerprint sketches."""
    from .scalar import hash_utf8

    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = [w for toks in toks_per_doc for w in toks]
    if not flat:
        return np.empty(0, dtype=np.uint64), offs
    return hash_utf8(pa.array(flat, pa.string()), seed=41), offs


def batch_shingle_hashes(texts: list, k: int = 3) -> list:
    """k-token shingle hashes for a whole batch, vectorized: every
    token of every doc is hashed in ONE vectorized pass (repo-owned stable hash, fixed
    seed — process-stable), then consecutive token hashes combine into
    shingle hashes with k vectorized polynomial steps (uint64
    wraparound arithmetic — deterministic, same convention as
    minhash_signature). Replaces a per-shingle blake2b Python loop
    that was the MinHash stage's dominant cost. Returns one uint64
    array per input text (empty for empty/whitespace-only docs;
    a doc with fewer than k tokens yields one shingle of all its
    tokens).

    Round-2 migration: the shingle hash family changed from blake2b
    over joined strings to this combine — MinHash/Jaccard sketch
    VALUES differ from round 1; golden fixtures regenerated via
    tools/make_golden.py (semantic pins in pytest are value-free).
    """
    h, offs = _flat_token_hashes(texts)
    if len(h) == 0:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    out = []
    for d in range(len(texts)):
        hd = h[offs[d] : offs[d + 1]]
        n = len(hd)
        if n == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        kk = min(k, n)
        m = n - kk + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(kk):  # k (≤3 typical) vector ops per doc
            acc = acc * _SHINGLE_B + hd[j : j + m]
        out.append(acc)
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles → stable 64-bit hashes (uint64). Single-doc
    convenience over ``batch_shingle_hashes`` (same hash family)."""
    return batch_shingle_hashes([text], k)[0]


_GRAM_B2 = np.uint64(0x100000001B3)  # second polynomial base (FNV-64 prime)


def batch_gram_position_hashes(texts: list, k: int):
    """POSITIONAL k-gram hashes for a whole batch: for every doc with
    >= k whitespace tokens, one 128-bit gram identity per start
    position 0..n-k, as two independent 64-bit values (two token-hash
    seeds × two polynomial bases — a false 128-bit merge is ~2^-64 per
    colliding pair). Unlike ``batch_shingle_hashes`` (which returns
    per-doc SETS for whole-doc sketches), this keeps the position — the
    front-end of exact-substring dedup, where the positions are what
    get cut.

    Fully vectorized across the batch: one tokenize pass, two C hash
    passes over the flat token array, k vector ops per base over the
    FLAT array, then cross-doc windows masked out by comparing the doc
    index of a window's first and last token. Docs with fewer than k
    tokens emit nothing (below the minimum match length).

    Returns ``(doc_local_idx, gram_idx, h1, h2)`` flat int64/uint64
    arrays, sorted by (doc, position).
    """
    from .scalar import hash_utf8

    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = [w for toks in toks_per_doc for w in toks]
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.uint64),
        np.empty(0, np.uint64),
    )
    n_flat = len(flat)
    if n_flat < k:
        return empty
    arr = pa.array(flat, pa.string())
    h1 = hash_utf8(arr, seed=41)
    h2 = hash_utf8(arr, seed=9173)
    m = n_flat - k + 1
    acc1 = np.zeros(m, dtype=np.uint64)
    acc2 = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc1 = acc1 * _SHINGLE_B + h1[j : j + m]
        acc2 = acc2 * _GRAM_B2 + h2[j : j + m]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    valid = doc_of[:m] == doc_of[k - 1 : k - 1 + m]
    p = np.nonzero(valid)[0]
    if len(p) == 0:
        return empty
    d = doc_of[p]
    gram_idx = p - offs[d]
    return d, gram_idx, acc1[p], acc2[p]


def minhash_params(num_perm: int = 64, seed: int = 7) -> tuple:
    """Deterministic (a, b) permutation parameters (universal hashing)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (Broder 1997): min over (a*h + b) mod p per
    permutation. Vectorized perms × shingles."""
    if len(hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = hashes % _MERSENNE
    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_signatures_batch(
    hash_list: list, a: np.ndarray, b: np.ndarray, *, shingle_budget: int = 262_144
) -> np.ndarray:
    """MinHash signatures for a whole batch of docs at once: [D, P]
    uint64, row d == ``minhash_signature(hash_list[d], a, b)`` exactly
    (same uint64 elementwise ops, same wraparound, so downstream band
    keys are byte-identical). One (a·h+b) mod p matrix over the
    CONCATENATED shingles and one ``np.minimum.reduceat`` per chunk
    replace the per-doc Python round-trips; ``shingle_budget`` bounds
    the [P, N] transient (~128 MB at the defaults). Empty docs get the
    all-MAX signature, matching the per-doc function."""
    P = len(a)
    D = len(hash_list)
    out = np.full((D, P), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.array([len(h) for h in hash_list], dtype=np.int64)
    live = np.nonzero(lens > 0)[0]
    i = 0
    while i < len(live):
        j = i
        tot = 0
        while j < len(live) and (tot == 0 or tot + lens[live[j]] <= shingle_budget):
            tot += lens[live[j]]
            j += 1
        idx = live[i:j]
        flat = np.concatenate([hash_list[d] for d in idx]).astype(np.uint64) % _MERSENNE
        vals = (a[:, None] * flat[None, :] + b[:, None]) % _MERSENNE  # [P, tot]
        starts = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
        out[idx] = np.minimum.reduceat(vals, starts, axis=1).T
        i = j
    return out


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list:
    """Split a signature into bands; one stable hex key per band.
    Docs sharing any (band_id, key) are near-dup candidates
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3)."""
    rows = len(sig) // bands
    keys = []
    for bi in range(bands):
        chunk = sig[bi * rows : (bi + 1) * rows]
        keys.append(hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest())
    return keys


def batch_simhash64(texts: list) -> np.ndarray:
    """64-bit SimHash (Charikar 2002) over whitespace tokens for a
    whole batch: one shared token-hash pass, one ±1-bit int8 matrix
    over ALL tokens (8 B/token — the only large transient), per-doc
    bit votes via a sliced sum per doc (a handful of C reductions per
    doc; a full int64 cumsum matrix would cost 64× more transient
    memory per batch), sign → packed uint64. Empty/whitespace-only
    docs hash to 0."""
    h, offs = _flat_token_hashes(texts)
    n = len(texts)
    if len(h) == 0:
        return np.zeros(n, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    pm = (((h[:, None] >> shifts[None, :]) & 1).astype(np.int8) * 2 - 1)
    v = np.zeros((n, 64), dtype=np.int64)
    for i in range(n):
        if offs[i] < offs[i + 1]:
            v[i] = pm[offs[i] : offs[i + 1]].sum(axis=0, dtype=np.int64)
    return ((v > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64(text: str) -> int:
    """Single-doc convenience over ``batch_simhash64`` (same values)."""
    return int(batch_simhash64([text])[0])


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 lacks
    bitwise_count): byte-table lookup over the little-endian view."""
    bytes_view = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[bytes_view].reshape(*x.shape, 8).sum(axis=-1).astype(np.int64)


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance of a uint64 array against one value."""
    return popcount64(a ^ np.uint64(b))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def winnow_fingerprints(
    texts: list, k: int = 4, w: int = 8, base: int = 1_000_003
) -> list:
    """FULL winnowing fingerprint set per doc (Schleimer et al. SIGMOD
    2003): rolling polynomial hash over every ``k``-token gram, then
    the unique minima of all ``w``-wide windows. Guarantee: two docs
    sharing a run of >= w + k - 1 identical tokens share at least one
    fingerprint — substring-level overlap detection, which whole-doc
    shingle Jaccard misses (a page quoting a paragraph of another page
    has tiny global Jaccard but certain fingerprint collision).
    ``rolling_fingerprint`` above is the 1-value identity special case;
    this returns the set. Token hashing is one shared C pass; the
    k-gram combine is k vector ops and the window min one
    sliding_window_view reduction per doc."""
    h, offs = _flat_token_hashes(texts)
    mod = np.uint64((1 << 61) - 1)
    b = np.uint64(base)
    out = []
    for i in range(len(texts)):
        hs = h[offs[i] : offs[i + 1]] % mod
        n = len(hs)
        if n == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        kk = min(k, n)
        acc = np.zeros(n - kk + 1, dtype=np.uint64)
        for j in range(kk):
            acc = (acc * b + hs[j : j + len(acc)]) % mod
        if len(acc) <= w:
            out.append(np.unique(acc.min(keepdims=True)))
        else:
            wins = np.lib.stride_tricks.sliding_window_view(acc, w)
            out.append(np.unique(wins.min(axis=1)))
    return out


def compression_ratio(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """zlib-deflate size / raw size per document (level 6) — the
    RefinedWeb/Dolma-family gibberish-vs-repetition signal: heavily
    repeated boilerplate compresses to a small fraction, natural prose
    sits around 0.3-0.6, random noise near 1.0. Empty/null docs report
    0.0. Per-row zlib is one C call per document (no Python inner
    loop); treat it as a tagger-pass signal, not a hot-path kernel."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_pylist()
    out = np.zeros(len(vals), np.float64)
    for i, s in enumerate(vals):
        if s:
            b = s.encode("utf-8")
            out[i] = len(zlib.compress(b, 6)) / len(b)
    return pa.array(out, pa.float64())


# sentence segmentation: boundary = terminal punctuation (+closing
# quotes/brackets) then whitespace then a capital/digit/opening quote;
# known abbreviations un-mark their false boundaries (RE2 has no
# lookaround, so boundaries are marked with a sentinel and wrong marks
# reverted — whitespace at a reverted boundary normalizes to one space)
_SENT_MARK = "\x1e"
_SENT_BOUNDARY = r'([.!?]["\')\]]*)[ \t]+([A-Z0-9"\'(])'
_SENT_ABBREV = (
    r'\b(?:Mr|Mrs|Ms|Dr|Prof|St|vs|etc|e\.g|i\.e|U\.S|U\.K|Inc|Ltd|Jr|Sr'
    r'|No|Fig|al|approx|dept|est)\.'
)


def split_sentences(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Rule-based sentence segmentation, fully Arrow-vectorized (three
    RE2 kernels, no Python per row) -> list<string> of sentences per
    document. The C4/CCNet class of heuristic: terminal punctuation
    followed by whitespace and a capital/digit opens a sentence; a
    guarded abbreviation list prevents the classic false splits
    ("Mr. Smith", "U.S. Economy", "Fig. 3"). An abbreviation at a TRUE
    sentence end merges with the next sentence — the documented cost
    of lookaround-free RE2 rules; newline is NOT a boundary by itself
    (compose with line/paragraph splitters for display-text corpora)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # a literal sentinel in the input (C0 control, never legitimate
    # text) would fabricate boundaries — neutralize it to a space first
    col = pc.replace_substring(col, pattern=_SENT_MARK, replacement=" ")
    marked = pc.replace_substring_regex(
        col, pattern=_SENT_BOUNDARY, replacement="\\1" + _SENT_MARK + "\\2"
    )
    unmarked = pc.replace_substring_regex(
        marked,
        pattern="(" + _SENT_ABBREV + r'["\')\]]*)' + _SENT_MARK,
        replacement="\\1 ",
    )
    return pc.split_pattern(unmarked, _SENT_MARK)


# Gopher quality-filter thresholds (Rae et al. 2021, arXiv:2112.11446
# table A1 — public paper). Our repetition signals measure the
# occurrence fraction of repeated n-grams (not the paper's
# character-mass fraction); the thresholds below are applied to that
# statistic and the delta is documented here and in the filter test.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1       # '#' and ellipsis per word
GOPHER_MAX_BULLET_LINE_FRAC = 0.9   # drop only when MORE than 90% of lines are bullets
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.20
GOPHER_MAX_TOP_3GRAM_FRAC = 0.18
GOPHER_MAX_TOP_4GRAM_FRAC = 0.16


def gopher_rules(col: "pa.ChunkedArray | pa.Array") -> pa.Table:
    """Per-rule boolean columns for the Gopher document filter — all
    Arrow/RE2 vectorized (the repetition rules live in
    ``repetition_features``; ``gopher_filter_ds`` combines both).
    True = the rule PASSES (doc survives that rule)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n_tokens = token_count(col).cast(pa.float64())
    safe_tokens = pc.max_element_wise(n_tokens, 1.0)
    n_chars = pc.utf8_length(col).cast(pa.float64())
    n_spaces = pc.count_substring_regex(col, r"\s").cast(pa.float64())
    mean_tok = pc.divide(pc.subtract(n_chars, n_spaces), safe_tokens)

    symbols = pc.count_substring_regex(col, r"#|\.\.\.|…").cast(pa.float64())
    n_lines = pc.add(
        pc.count_substring_regex(col, r"\n").cast(pa.float64()), 1.0
    )
    bullet_lines = pc.count_substring_regex(
        col, r"(?m)^[ \t]*[-*•‣▪]"
    ).cast(pa.float64())
    ellipsis_lines = pc.count_substring_regex(
        col, r"(?m)(\.\.\.|…)[ \t]*$"
    ).cast(pa.float64())
    alpha_words = pc.count_substring_regex(
        col, r"[^\s]*[A-Za-z][^\s]*"
    ).cast(pa.float64())
    lower = pc.utf8_lower(col)
    stop_hits = None
    for w in GOPHER_REQUIRED_STOPWORDS:
        hit = pc.match_substring_regex(lower, r"\b" + w + r"\b").cast(pa.int32())
        stop_hits = hit if stop_hits is None else pc.add(stop_hits, hit)

    return pa.table(
        {
            "rule_word_count": pc.and_(
                pc.greater_equal(n_tokens, GOPHER_MIN_WORDS),
                pc.less_equal(n_tokens, GOPHER_MAX_WORDS),
            ),
            "rule_mean_word_len": pc.and_(
                pc.greater_equal(mean_tok, GOPHER_MEAN_WORD_LEN[0]),
                pc.less_equal(mean_tok, GOPHER_MEAN_WORD_LEN[1]),
            ),
            "rule_symbol_ratio": pc.less(
                pc.divide(symbols, safe_tokens), GOPHER_MAX_SYMBOL_RATIO
            ),
            # table A1 removes a doc only when MORE than 90% of its
            # lines start with a bullet (a README with a modest list
            # must pass — the inverted <=10% reading over-filters)
            "rule_bullet_lines": pc.less_equal(
                pc.divide(bullet_lines, n_lines), GOPHER_MAX_BULLET_LINE_FRAC
            ),
            "rule_ellipsis_lines": pc.less_equal(
                pc.divide(ellipsis_lines, n_lines), GOPHER_MAX_ELLIPSIS_LINE_FRAC
            ),
            "rule_alpha_words": pc.greater_equal(
                pc.divide(alpha_words, safe_tokens), GOPHER_MIN_ALPHA_WORD_FRAC
            ),
            "rule_stopwords": pc.greater_equal(
                stop_hits, GOPHER_MIN_STOPWORD_HITS
            ),
        }
    )


def top_ngram_fractions(texts: list, ns=(2, 3, 4)) -> pa.Table:
    """Per-doc share of all n-gram occurrences taken by the single
    most frequent n-gram, for each n — the statistic the Gopher
    top-n-gram rules threshold (0.20/0.18/0.16 for n=2/3/4, table A1;
    the paper measures the character mass of that n-gram, this is the
    occurrence share — same detector, documented variant). Shares one
    token-hash pass across all n (the repetition_features machinery;
    kept separate because that function's column set is pinned by a
    gate oracle)."""
    h, offs = _flat_token_hashes(texts)
    n_docs = len(texts)
    out = {n: np.zeros(n_docs, dtype=np.float64) for n in ns}
    for d in range(n_docs):
        hd = h[offs[d] : offs[d + 1]]
        for n in ns:
            m = len(hd) - n + 1
            if m < 1:
                continue
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                acc = acc * _SHINGLE_B + hd[j : j + m]
            _, counts = np.unique(acc, return_counts=True)
            out[n][d] = counts.max() / m
    return pa.table(
        {f"top_{n}gram_frac": pa.array(out[n], pa.float64()) for n in ns}
    )


# --- script detection / readability / Luhn audit ------------------------------

_SCRIPTS = ("Latin", "Cyrillic", "Han", "Arabic", "Greek", "Hangul",
            "Hiragana", "Katakana", "Devanagari", "Hebrew")


def script_fractions(col) -> pa.Table:
    """Per-document Unicode-script composition: fraction of LETTER
    characters in each major script (RE2 ``\\p{Script}`` classes — one
    vectorized count pass per script) plus ``main_script`` (argmax;
    "none" for letterless docs). The multilingual routing signal that
    survives when trigram language ID cannot separate same-script
    languages — and the cheap CJK/Arabic/Cyrillic detector before any
    per-language stage dispatch."""
    text = pc.fill_null(col, "")
    total = pc.count_substring_regex(text, r"\p{L}").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    denom = np.maximum(total, 1.0)
    cols = {}
    counts = []
    for s in _SCRIPTS:
        c = pc.count_substring_regex(text, rf"\p{{{s}}}").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        counts.append(c)
        cols[f"frac_{s.lower()}"] = pa.array(c / denom, pa.float64())
    mat = np.stack(counts)  # [script, doc]
    best = np.argmax(mat, axis=0)
    main = np.where(
        mat[best, np.arange(mat.shape[1])] > 0,
        np.array([s.lower() for s in _SCRIPTS], dtype=object)[best],
        "none",
    )
    cols["main_script"] = pa.array(main.tolist(), pa.string())
    cols["n_letters"] = pa.array(total.astype(np.int64), pa.int64())
    return pa.table(cols)


def readability_features(col) -> pa.Table:
    """Flesch reading ease (Flesch 1948; Kincaid et al. 1975 for the
    grade form) from three vectorized counts: words (whitespace
    tokens), sentences (``[.!?]+`` runs, min 1), syllables (vowel
    GROUPS ``(?i)[aeiouy]+`` — the standard cheap approximation).
    ``flesch = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)``; also returns the two ratios. Heuristic
    by construction (as every corpus-scale readability signal is) and
    a pure function of the text — layout/retry-stable."""
    text = pc.fill_null(col, "")
    words = token_count(text).to_numpy(zero_copy_only=False).astype(np.float64)
    sents = np.maximum(
        pc.count_substring_regex(text, r"[.!?]+")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64),
        1.0,
    )
    syll = pc.count_substring_regex(text, r"(?i)[aeiouy]+").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    wps = words / sents
    spw = syll / np.maximum(words, 1.0)
    flesch = np.where(
        words > 0, 206.835 - 1.015 * wps - 84.6 * spw, 0.0
    )
    return pa.table(
        {
            "words_per_sentence": pa.array(np.where(words > 0, wps, 0.0)),
            "syllables_per_word": pa.array(spw, pa.float64()),
            "flesch_reading_ease": pa.array(flesch, pa.float64()),
        }
    )


_CC_CAND_RE = r"\b(?:\d[ -]?){12,18}\d\b"  # 13-19 digits, sep-tolerant


def luhn_valid(digits: str) -> bool:
    """Luhn mod-10 checksum (ISO/IEC 7812) over a digit string."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def cc_audit(col) -> pa.Table:
    """Credit-card PII audit with checksum precision: candidates are
    13-19 digit runs (space/dash tolerant), and each candidate is
    verified with the Luhn checksum — cutting the false-positive rate
    of a bare digit-run pattern by ~10× (a random digit run passes
    Luhn 1-in-10). Returns per-doc ``n_cc_candidates`` and
    ``n_cc_luhn_valid``.

    Scale shape — the deferred-verification pattern: ONE vectorized
    RE2 prefilter finds the (rare) docs with any candidate; Python
    ``finditer`` + Luhn run only on those hits, so the per-match work
    touches a vanishing corpus fraction. Complements ``scrub_pii``
    (which redacts broadly, recall-oriented); this measures precisely,
    precision-oriented — run it as an attribute tagger and filter or
    route on the counts."""
    import re

    text = pc.fill_null(col, "")
    n = len(text)
    cand_counts = pc.count_substring_regex(text, _CC_CAND_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    valid = np.zeros(n, dtype=np.int64)
    hits = np.flatnonzero(cand_counts > 0)
    if len(hits):
        rx = re.compile(_CC_CAND_RE)
        texts = text.take(pa.array(hits, pa.int64())).to_pylist()
        for row, t in zip(hits, texts):
            v = 0
            for m in rx.finditer(t):
                digits = re.sub(r"[ -]", "", m.group())
                if 13 <= len(digits) <= 19 and luhn_valid(digits):
                    v += 1
            valid[row] = v
    return pa.table(
        {
            "n_cc_candidates": pa.array(cand_counts, pa.int64()),
            "n_cc_luhn_valid": pa.array(valid, pa.int64()),
        }
    )
