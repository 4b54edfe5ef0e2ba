"""Interpolated bigram LM perplexity: exact brute-force parity
(unbudgeted), budgeted-bigram floor behavior, repetitive text scores
lower than shuffled text, layout invariance, OOV accounting."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

LAM = 0.7


def _corpus() -> pd.DataFrame:
    rng = np.random.RandomState(11)
    rows = []
    base = ("the cat sat on the mat and the dog sat on the rug while "
            "the cat saw the dog").split()
    for i in range(12):
        words = list(base)
        rng.shuffle(words)
        rows.append((i, " ".join(base if i % 2 else words)))
    rows.append((20, "zzzqqq xxyyzz unseen tokens only"))  # mostly OOV
    rows.append((21, ""))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _toks(t):
    return [w for w in re.split(r"[^a-z]+", (t or "").lower()) if w]


def _brute(df: pd.DataFrame, vocab_size: int, lam: float) -> pd.DataFrame:
    uni = Counter()
    for t in df["text"]:
        uni.update(_toks(t))
    total = sum(uni.values())
    vocab = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vmap = {w: i for i, (w, _) in enumerate(vocab)}
    V = len(vocab)
    uni_n = np.array([n for _, n in vocab], np.float64)
    oov_mass = max(total - uni_n.sum(), 1.0)
    p_uni = np.concatenate((uni_n, [oov_mass])) / total

    big, ctx = Counter(), Counter()
    for t in df["text"]:
        ids = [vmap.get(w, V) for w in _toks(t)]
        for a, b in zip(ids, ids[1:]):
            big[(a, b)] += 1
            ctx[a] += 1

    out = []
    for _, r in df.iterrows():
        ids = [vmap.get(w, V) for w in _toks(r["text"])]
        n_oov = sum(1 for w in _toks(r["text"]) if w not in vmap)
        if not ids:
            out.append((int(r["doc_id"]), 0, 0, 1.0))
            continue
        lps = [np.log(p_uni[ids[0]])]
        for a, b in zip(ids, ids[1:]):
            p_bi = big[(a, b)] / ctx[a] if ctx[a] else 0.0
            lps.append(np.log(lam * p_bi + (1 - lam) * p_uni[b]))
        ppl = float(np.exp(-np.mean(lps)))
        out.append((int(r["doc_id"]), len(ids), n_oov, ppl))
    return pd.DataFrame(out, columns=["doc_id", "n_tokens", "n_oov", "perplexity"])


def _run(df, repartition=None, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import bigram_perplexity_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    out = bigram_perplexity_ds(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_bigram_ppl_matches_brute_force(ray_session):
    df = _corpus()
    got = _run(df, vocab_size=64, bigram_budget=100_000, lam=LAM)
    want = _brute(df, vocab_size=64, lam=LAM)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want, rtol=1e-10
    )
    by_id = got.set_index("doc_id")
    # the unshuffled docs repeat the training bigrams -> lower ppl than
    # the shuffled permutations of the same words
    ordered = by_id.loc[[i for i in range(12) if i % 2 == 1], "perplexity"]
    shuffled = by_id.loc[[i for i in range(12) if i % 2 == 0], "perplexity"]
    assert ordered.mean() < shuffled.mean()
    assert by_id.loc[21, "n_tokens"] == 0 and by_id.loc[21, "perplexity"] == 1.0
    # a vocab too small for doc 20's rare tokens accounts them as OOV
    small = _run(df, vocab_size=8, bigram_budget=100_000, lam=LAM)
    want_small = _brute(df, vocab_size=8, lam=LAM)
    pd.testing.assert_frame_equal(
        small.astype(want_small.dtypes.to_dict()), want_small, rtol=1e-10
    )
    assert small.set_index("doc_id").loc[20, "n_oov"] > 0


def test_bigram_ppl_budget_floor(ray_session):
    """With bigram_budget=0 every pair takes the (1-lam)·p_uni floor:
    perplexity is the unigram value inflated by exactly 1/(1-lam) on
    the bigram-scored positions — still finite, never raises."""
    df = _corpus()
    got = _run(df, vocab_size=64, bigram_budget=0, lam=LAM)
    assert np.isfinite(got["perplexity"]).all()
    full = _run(df, vocab_size=64, bigram_budget=100_000, lam=LAM)
    merged = got.merge(full, on="doc_id", suffixes=("_floor", "_full"))
    multi = merged[merged["n_tokens_full"] > 1]
    assert (
        multi["perplexity_floor"] >= multi["perplexity_full"] - 1e-9
    ).all()


def test_bigram_ppl_layout_invariant(ray_session):
    df = _corpus()
    a = _run(df, vocab_size=32, bigram_budget=50, lam=LAM)
    b = _run(df.sample(frac=1.0, random_state=3).reset_index(drop=True),
             repartition=5, vocab_size=32, bigram_budget=50, lam=LAM)
    pd.testing.assert_frame_equal(a, b)


def test_bigram_ppl_rejects_lam_one(ray_session):
    """lam=1.0 has no interpolation floor: a budget-dropped bigram would
    contribute log(0) = -inf, so the validation excludes it."""
    import pytest

    with pytest.raises(ValueError, match=r"lam must be in \[0, 1\)"):
        _run(_corpus(), vocab_size=8, lam=1.0)


def test_bigram_ppl_token_free_corpus(ray_session):
    """A corpus with zero tokens anywhere keeps the per-doc contract:
    one (id, 0, 0, 1.0) row per doc, same as token-less docs get in a
    non-degenerate corpus — not an empty dataset."""
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "   ", None]})
    got = _run(df, vocab_size=8, lam=LAM)
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert (got["n_tokens"] == 0).all() and (got["n_oov"] == 0).all()
    assert (got["perplexity"] == 1.0).all()
