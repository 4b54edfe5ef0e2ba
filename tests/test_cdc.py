"""Content-defined chunking: sequential-gear parity, boundary
invariants, insertion resilience (the CDC property), planted-duplicate
dedup stats, corpus summary, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.stages.cdc import (
    _GEAR32,
    _gear_hash32,
    cdc_chunk_table,
    cdc_chunks_ds,
    cdc_corpus_summary,
    cdc_dedup_stats_ds,
)


def _slow_gear(data: bytes) -> np.ndarray:
    """Per-byte sequential reference: h = (h << 1) + G[b] mod 2^32."""
    h = 0
    out = np.empty(len(data), np.uint32)
    for i, b in enumerate(data):
        h = ((h << 1) + int(_GEAR32[b])) & 0xFFFFFFFF
        out[i] = h
    return out


def _slow_chunks(text: bytes, min_size, avg_size, max_size):
    """Reference chunker: greedy walk over the sequential gear hash."""
    h = _slow_gear(text)
    mask = avg_size - 1
    ends, pos, n = [], 0, len(text)
    while pos < n:
        cut = None
        hi = pos + max_size
        for t in range(pos + min_size - 1, min(hi, n) - 1):
            if (int(h[t]) & mask) == 0:
                cut = t + 1
                break
        if cut is None:
            cut = min(hi, n)
        ends.append(cut)
        pos = cut
    return ends


def test_vectorized_gear_matches_sequential():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 500, dtype=np.uint8)
    assert np.array_equal(_gear_hash32(data), _slow_gear(data.tobytes()))


def test_chunk_table_matches_slow_reference():
    rng = np.random.default_rng(1)
    texts = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))
        for n in (0, 40, 300, 1200, 5000)
    ]
    t = cdc_chunk_table(
        pa.array(texts, pa.string()), np.arange(len(texts)),
        min_size=32, avg_size=64, max_size=256,
    )
    df = t.to_pandas()
    for d, text in enumerate(texts):
        got = df[df["doc_id"] == d]
        want_ends = _slow_chunks(text.encode(), 32, 64, 256)
        assert got["chunk_len"].sum() == len(text.encode())
        rel_ends = np.cumsum(got["chunk_len"].to_numpy())
        assert rel_ends.tolist() == want_ends, f"doc {d}"


def test_bounds_reconstruction_and_determinism():
    rng = np.random.default_rng(2)
    texts = ["".join(chr(32 + int(c)) for c in rng.integers(0, 90, 4000))
             for _ in range(20)]
    t = cdc_chunk_table(pa.array(texts), np.arange(20)).to_pandas()
    for d, text in enumerate(texts):
        g = t[t["doc_id"] == d]
        lens = g["chunk_len"].to_numpy()
        assert lens.sum() == len(text.encode())
        assert (lens[:-1] >= 64).all() and (lens <= 1024).all()
    # batch-composition independence: single-doc batches give the same
    # chunks and hashes
    solo = pd.concat(
        [
            cdc_chunk_table(pa.array([x]), np.array([d])).to_pandas()
            for d, x in enumerate(texts)
        ]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        t.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True), solo
    )
    # identical content in different docs -> identical chunk hash sets
    t2 = cdc_chunk_table(pa.array([texts[0], texts[0]]), np.array([0, 1])).to_pandas()
    a = t2[t2["doc_id"] == 0]["chunk_hash"].tolist()
    b = t2[t2["doc_id"] == 1]["chunk_hash"].tolist()
    assert a == b


def test_insertion_resilience_vs_fixed_chunking():
    """The CDC selling point: a prefix edit leaves most chunk hashes
    unchanged (boundaries resynchronize), unlike fixed-size slicing."""
    rng = np.random.default_rng(3)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 8000))
    edited = "INSERTED-PREFIX-" * 4 + base
    t = cdc_chunk_table(pa.array([base, edited]), np.array([0, 1])).to_pandas()
    h0 = set(t[t["doc_id"] == 0]["chunk_hash"])
    h1 = set(t[t["doc_id"] == 1]["chunk_hash"])
    overlap = len(h0 & h1) / len(h0)
    assert overlap > 0.8, overlap
    # fixed-size slicing of the same pair shares almost nothing
    fixed0 = {base[i : i + 256] for i in range(0, len(base), 256)}
    shifted = edited
    fixed1 = {shifted[i : i + 256] for i in range(0, len(shifted), 256)}
    assert len(fixed0 & fixed1) / len(fixed0) < 0.1


def test_param_validation():
    with pytest.raises(ValueError, match="power of two"):
        cdc_chunk_table(pa.array(["x"]), np.array([0]), avg_size=100)
    with pytest.raises(ValueError, match=">= 32"):
        cdc_chunk_table(pa.array(["x"]), np.array([0]), min_size=16)
    with pytest.raises(ValueError, match="min_size <= avg_size"):
        cdc_chunk_table(pa.array(["x"]), np.array([0]),
                        min_size=512, avg_size=256, max_size=128)


def _docs_ds(df, parts=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def test_dedup_stats_planted_duplicates(ray_session):
    rng = np.random.default_rng(5)
    uniq = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 3000))
        for _ in range(6)
    ]
    # docs 0/1 identical; doc 2 = doc 0 with an inserted prefix;
    # docs 3..5 unique
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [uniq[0], uniq[0], "XX-PREFIX-XX " + uniq[0],
                     uniq[3], uniq[4], uniq[5]],
        }
    )
    stats = (
        cdc_dedup_stats_ds(_docs_ds(df, 3))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert stats.loc[0, "dup_fraction"] == 1.0
    assert stats.loc[1, "dup_fraction"] == 1.0
    assert stats.loc[2, "dup_fraction"] > 0.8  # near-dup via insertion
    for d in (3, 4, 5):
        assert stats.loc[d, "dup_fraction"] < 0.1
    assert (stats["n_bytes"] == df["text"].str.len().values).all()

    # layout invariance
    stats2 = (
        cdc_dedup_stats_ds(_docs_ds(df.sample(frac=1.0, random_state=1), 5))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    pd.testing.assert_frame_equal(stats, stats2)


def test_corpus_summary(ray_session):
    rng = np.random.default_rng(6)
    body = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 5000))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [body, body, body, body],  # 4x duplication
        }
    )
    s = cdc_corpus_summary(_docs_ds(df, 2)).iloc[0]
    assert s["total_bytes"] == 4 * len(body)
    assert s["unique_chunk_bytes"] == len(body)
    assert s["dedup_ratio"] == pytest.approx(4.0)
