"""UniMax / temperature source mixing (Chung et al. 2023,
arXiv:2304.09151; Xue et al. 2021, arXiv:2010.11934): allocation
worked examples, budget conservation, cap enforcement, expansion
parity with a brute-force md5 oracle, layout invariance, and the
end-to-end budget invariant over the documents table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_unimax_allocation_worked_example():
    from textextract_ray.pipelines.textops import unimax_allocation

    counts = {"a": 100, "b": 1000, "c": 10000}
    w = unimax_allocation(counts, 6000, max_epochs=2.0)
    # smallest-first: a capped at 2 epochs (200), b capped (2000),
    # c takes the rest (3800)
    assert w["a"] == pytest.approx(2.0)
    assert w["b"] == pytest.approx(2.0)
    assert w["c"] == pytest.approx(0.38)
    # allocation exhausts the budget exactly when the cap doesn't bind
    assert sum(w[k] * counts[k] for k in counts) == pytest.approx(6000)


def test_unimax_allocation_cap_and_edges():
    from textextract_ray.pipelines.textops import unimax_allocation

    counts = {"a": 100, "b": 1000}
    # budget beyond cap*total: every source saturates at max_epochs
    w = unimax_allocation(counts, 10**9, max_epochs=3.0)
    assert w == {"a": pytest.approx(3.0), "b": pytest.approx(3.0)}
    # tiny budget: uniform split, nobody capped
    w = unimax_allocation(counts, 200, max_epochs=4.0)
    assert w["a"] == pytest.approx(1.0)  # 100 tokens of budget / 100
    assert w["b"] == pytest.approx(0.1)
    # zero-count sources get weight 0 and don't break the split
    w = unimax_allocation({"a": 0, "b": 50}, 100, max_epochs=4.0)
    assert w["a"] == 0.0 and w["b"] == pytest.approx(2.0)
    with pytest.raises(ValueError):
        unimax_allocation(counts, -1)


def test_temperature_allocation():
    from textextract_ray.pipelines.textops import temperature_allocation

    counts = {"a": 100, "b": 900}
    # alpha=1: proportional sampling -> identical epoch count everywhere
    w = temperature_allocation(counts, 500, alpha=1.0)
    assert w["a"] == pytest.approx(0.5) and w["b"] == pytest.approx(0.5)
    # alpha->0: equal budget shares -> small sources get more epochs
    w = temperature_allocation(counts, 500, alpha=1e-9)
    assert w["a"] == pytest.approx(250 / 100, rel=1e-6)
    assert w["b"] == pytest.approx(250 / 900, rel=1e-6)
    # budget conserved for any alpha
    w = temperature_allocation(counts, 500, alpha=0.3)
    assert sum(w[k] * counts[k] for k in counts) == pytest.approx(500)


def _corpus() -> pd.DataFrame:
    rows = []
    texts = {
        "big": "alpha beta gamma delta epsilon zeta",  # 6 tokens
        "mid": "one two three",  # 3 tokens
        "small": "x",  # 1 token
    }
    i = 0
    for src, reps in (("big", 40), ("mid", 10), ("small", 3)):
        for _ in range(reps):
            rows.append((i, src, texts[src]))
            i += 1
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"])


def test_source_token_counts(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import source_token_counts_ds

    df = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = source_token_counts_ds(ds)
    want = {"big": 240, "mid": 30, "small": 3}
    assert got == want
    # layout invariant
    got7 = source_token_counts_ds(ds.repartition(7))
    assert got7 == want


def _brute_mix(df: pd.DataFrame, weights: dict[str, float]) -> pd.DataFrame:
    from textextract_ray.functions.text import md5_hex

    out = []
    for _, r in df.iterrows():
        w = weights.get(r["source"], 0.0)
        full = int(np.floor(w))
        thr = format(int(round((w - full) * 16**8)), "08x")
        for c in range(full):
            out.append((r["doc_id"], r["source"], c))
        h = md5_hex([f"{int(r['doc_id'])}:{full}"])[0][:8]
        if h < thr:
            out.append((r["doc_id"], r["source"], full))
    return (
        pd.DataFrame(out, columns=["doc_id", "source", "copy_idx"])
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )


def test_mix_by_weights_matches_brute_force(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import mix_by_weights_ds

    df = _corpus()
    weights = {"big": 0.4, "mid": 2.5, "small": 4.0}
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        mix_by_weights_ds(ds, weights)
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    want = _brute_mix(df, weights)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    # layout invariance
    got7 = (
        mix_by_weights_ds(ds.repartition(7), weights)
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got7.astype(want.dtypes.to_dict()), want)


def test_unimax_mix_end_to_end(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import (
        source_token_counts_ds,
        unimax_allocation,
        unimax_mix_ds,
    )

    df = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    budget = 150
    cap = 3.0
    mixed = unimax_mix_ds(ds, budget_tokens=budget, max_epochs=cap).to_pandas()
    counts = source_token_counts_ds(ds)
    weights = unimax_allocation(counts, budget, max_epochs=cap)
    tok = {"big": 6, "mid": 3, "small": 1}
    # realized per-source copy counts track weight * n_docs: the full
    # copies are exact, the fractional copy is an unbiased md5 draw
    per_src = mixed.groupby("source").size().to_dict()
    n_docs = df.groupby("source").size().to_dict()
    for src, w in weights.items():
        lo = int(np.floor(w)) * n_docs[src]
        hi = (int(np.floor(w)) + 1) * n_docs[src]
        assert lo <= per_src.get(src, 0) <= hi, (src, w, per_src)
    # no source exceeds the epoch cap in realized tokens
    for src, n in per_src.items():
        assert n * tok[src] <= cap * counts[src] + tok[src] * n_docs[src]
    # small sources are upweighted relative to proportional sampling
    assert weights["small"] > weights["big"]
