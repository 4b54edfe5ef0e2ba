"""Kneser-Ney trigram LM: exact brute-force parity (unbudgeted),
layout invariance, short-doc/OOV edges, and budget-truncation
graceful backoff."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tok(t: str) -> list:
    return [w for w in re.split("[^a-z]+", t.lower()) if w]


def _slow_kn(texts: dict, vocab_size: int) -> dict:
    """Single-process reference implementing the documented spec."""
    counts = Counter()
    for t in texts.values():
        counts.update(_tok(t))
    vocab = [
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    ]
    wid = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    unk, A = V, V + 1

    seqs = {d: [wid.get(w, unk) for w in _tok(t)] for d, t in texts.items()}
    tri = Counter()
    big_types = set()
    for s in seqs.values():
        for i in range(1, len(s)):
            big_types.add((s[i - 1], s[i]))
        for i in range(2, len(s)):
            tri[(s[i - 2], s[i - 1], s[i])] += 1

    U = Counter(w for _v, w in big_types)
    B = len(big_types)
    p1 = [(U[w] + 1.0) / (B + A) for w in range(A)]

    T_vw = Counter((v, w) for (_u, v, w) in tri)
    T_v, R_v = Counter(), Counter()
    for (v, _w), t in T_vw.items():
        T_v[v] += t
        R_v[v] += 1
    c_uv, t_uv = Counter(), Counter()
    for (u, v, _w), c in tri.items():
        c_uv[(u, v)] += c
        t_uv[(u, v)] += 1

    n1_3 = sum(1 for c in tri.values() if c == 1)
    n2_3 = sum(1 for c in tri.values() if c == 2)
    n1_2 = sum(1 for c in T_vw.values() if c == 1)
    n2_2 = sum(1 for c in T_vw.values() if c == 2)
    D3 = n1_3 / (n1_3 + 2.0 * n2_3) if (n1_3 + 2 * n2_3) else 0.5
    D2 = n1_2 / (n1_2 + 2.0 * n2_2) if (n1_2 + 2 * n2_2) else 0.5

    def p2(w, v):
        if T_v[v] > 0:
            return (max(T_vw[(v, w)] - D2, 0.0) + D2 * R_v[v] * p1[w]) / T_v[v]
        return p1[w]

    def p3(w, v, u):
        if c_uv[(u, v)] > 0:
            return (
                max(tri[(u, v, w)] - D3, 0.0) + D3 * t_uv[(u, v)] * p2(w, v)
            ) / c_uv[(u, v)]
        return p2(w, v)

    out = {}
    for d, s in seqs.items():
        if not s:
            out[d] = 1.0
            continue
        lp = math.log(p1[s[0]])
        if len(s) > 1:
            lp += math.log(p2(s[1], s[0]))
        for i in range(2, len(s)):
            lp += math.log(p3(s[i], s[i - 1], s[i - 2]))
        out[d] = math.exp(-lp / len(s))
    return out


def _corpus(n_docs=40, seed=4):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts = {}
    for d in range(n_docs):
        k = int(rng.integers(0, 60))
        body = " ".join(words[int(i)] for i in rng.integers(0, len(words), k))
        if d % 7 == 0:
            body = "the quick brown fox jumps over the lazy dog " + body
        texts[d] = body
    texts[0] = ""          # empty doc
    texts[1] = "alpha"     # 1 token
    texts[2] = "beta gamma"  # 2 tokens
    return texts


def _ds(texts, parts=1):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    ).astype({"doc_id": np.int64})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def test_kn_matches_bruteforce_unbudgeted(ray_session):
    from textextract_ray.pipelines.textops import kn_trigram_perplexity_ds

    texts = _corpus()
    got = (
        kn_trigram_perplexity_ds(_ds(texts, 5), vocab_size=1 << 12)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _slow_kn(texts, 1 << 12)
    assert len(got) == len(texts)
    for d, ppl in want.items():
        assert got.loc[d, "perplexity"] == pytest.approx(ppl, rel=1e-9), d
    assert got.loc[0, "n_tokens"] == 0 and got.loc[0, "perplexity"] == 1.0
    assert got.loc[1, "n_tokens"] == 1
    assert (got["n_oov"] == 0).all()  # vocab covers everything here


def test_kn_oov_and_small_vocab_parity(ray_session):
    from textextract_ray.pipelines.textops import kn_trigram_perplexity_ds

    texts = _corpus(seed=9)
    got = (
        kn_trigram_perplexity_ds(_ds(texts, 3), vocab_size=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _slow_kn(texts, 4)
    for d, ppl in want.items():
        assert got.loc[d, "perplexity"] == pytest.approx(ppl, rel=1e-9), d
    assert got["n_oov"].sum() > 0  # OOV path exercised


def test_kn_layout_invariance(ray_session):
    from textextract_ray.pipelines.textops import kn_trigram_perplexity_ds

    texts = _corpus(seed=2)
    a = (
        kn_trigram_perplexity_ds(_ds(texts, 1))
        .to_pandas().set_index("doc_id").sort_index()
    )
    b = (
        kn_trigram_perplexity_ds(_ds(texts, 11))
        .to_pandas().set_index("doc_id").sort_index()
    )
    pd.testing.assert_frame_equal(a, b)


def test_kn_budget_backoff_graceful(ray_session):
    from textextract_ray.pipelines.textops import kn_trigram_perplexity_ds

    texts = _corpus(seed=3)
    tiny = (
        kn_trigram_perplexity_ds(
            _ds(texts, 2), trigram_budget=2, context_budget=2, bigram_budget=2
        )
        .to_pandas()
    )
    assert np.isfinite(tiny["perplexity"]).all()
    assert (tiny["perplexity"] >= 1.0).all()
    # repeated phrase docs still score better than random ones even
    # under extreme truncation? not guaranteed — only finiteness is.
