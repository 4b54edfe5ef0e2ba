"""Frequent-line boilerplate removal (CCNet §2.1 line-wise): exact
brute-force oracle parity, short-line bypass, drop-empty semantics,
layout invariance, budget guard, and threshold edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

BANNER = "Please enable javascript to continue using this website."
COOKIE = "We use cookies to improve your experience on our site."
SHORT = "Read more"  # < 30 chars: bypasses even though it repeats


def _corpus() -> pd.DataFrame:
    rows = []
    for i in range(12):
        body = f"Unique body paragraph number {i} with enough characters to count."
        lines = [BANNER, body, SHORT]
        if i % 2 == 0:
            lines.append(COOKIE)
        if i == 7:
            lines = [BANNER, BANNER]  # doc that becomes empty
        rows.append((i, "\n".join(lines)))
    rows.append((50, ""))  # empty doc
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute(df: pd.DataFrame, min_chars=30, min_count=3, drop_empty=True):
    from collections import Counter

    counts = Counter()
    for t in df["text"]:
        for ln in (t or "").split("\n"):
            if len(ln) >= min_chars:
                counts[ln] += 1
    frequent = {ln for ln, c in counts.items() if c >= min_count}
    out = []
    for _, r in df.iterrows():
        lines = (r["text"] or "").split("\n")
        kept = [ln for ln in lines if not (len(ln) >= min_chars and ln in frequent)]
        n_dropped = len(lines) - len(kept)
        text = "\n".join(kept)
        if drop_empty and not text:
            continue
        out.append((r["doc_id"], text, n_dropped))
    return pd.DataFrame(out, columns=["doc_id", "text", "n_dropped"]).reset_index(
        drop=True
    )


def _run(df, repartition=None, **kw):
    import ray.data as rd

    from textextract_ray.pipelines.textops import line_frequency_filter_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    return (
        line_frequency_filter_ds(ds, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_linefreq_matches_brute_force(ray_session):
    df = _corpus()
    got = _run(df)
    want = _brute(df)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    # the banner is gone everywhere, bodies and the short line survive
    assert not got["text"].str.contains(BANNER, regex=False).any()
    # doc 7 was replaced by the all-banner body, so 11 of the 12 carry SHORT
    assert got["text"].str.contains(SHORT, regex=False).sum() == 11
    assert 7 not in set(got["doc_id"])  # all-boilerplate doc dropped
    assert 50 not in set(got["doc_id"])  # empty doc dropped


def test_linefreq_threshold_and_keep_empty(ray_session):
    df = _corpus()
    # min_count above every line's frequency: nothing removed
    got = _run(df, min_count=100, drop_empty=False)
    want = _brute(df, min_count=100, drop_empty=False)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    assert (got["n_dropped"] == 0).all()
    # keep-empty retains the hollowed-out and empty docs
    got = _run(df, drop_empty=False)
    assert 7 in set(got["doc_id"]) and 50 in set(got["doc_id"])
    assert got.loc[got["doc_id"] == 7, "text"].iloc[0] == ""


def test_linefreq_layout_invariant(ray_session):
    df = _corpus()
    a = _run(df)
    b = _run(df.sample(frac=1.0, random_state=5).reset_index(drop=True), repartition=7)
    pd.testing.assert_frame_equal(a, b)


def test_linefreq_budget_guard(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import line_frequency_filter_ds

    df = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    with pytest.raises(ValueError, match="set_budget"):
        line_frequency_filter_ds(ds, set_budget=0).to_pandas()
