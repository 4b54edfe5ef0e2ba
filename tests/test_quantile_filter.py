"""Quantile-calibrated adaptive filtering: threshold accuracy vs exact
order statistics, realized keep fraction, per-group independence,
bottom-side mode, layout invariance, and validation errors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n_per=400) -> pd.DataFrame:
    # deterministic, well-spread scores with very different per-group
    # distributions so one global threshold would be wrong
    rows = []
    i = 0
    for g, (lo, hi) in (("en", (0.0, 1.0)), ("de", (10.0, 20.0)), ("fr", (-5.0, 0.0))):
        for j in range(n_per):
            frac = (j * 2654435761 % 2**32) / 2**32  # Knuth hash spread
            rows.append((i, g, lo + frac * (hi - lo)))
            i += 1
    return pd.DataFrame(rows, columns=["doc_id", "lang", "score"])


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_quantile_filter_top_per_group(ray_session):
    from textextract_ray.pipelines.textops import quantile_filter_ds

    df = _corpus()
    out, thr = quantile_filter_ds(
        _ds(df), score_col="score", group_col="lang", keep_frac=0.25, side="top"
    )
    got = out.to_pandas()
    # per-group realized keep fraction within sketch tolerance
    for g, sub in df.groupby("lang"):
        kept = (got["lang"] == g).sum()
        assert abs(kept / len(sub) - 0.25) < 0.03, (g, kept)
        # threshold close to the exact per-group quantile
        exact = np.quantile(sub["score"], 0.75)
        scale = max(abs(exact), 1.0)
        assert abs(thr[g] - exact) < 0.02 * scale + 0.02
        # every kept row clears the group threshold
        assert (got.loc[got["lang"] == g, "score"] >= thr[g]).all()


def test_quantile_filter_bottom_and_global(ray_session):
    from textextract_ray.pipelines.textops import quantile_filter_ds

    df = _corpus()
    out, thr = quantile_filter_ds(
        _ds(df), score_col="score", keep_frac=0.5, side="bottom"
    )
    got = out.to_pandas()
    assert set(thr) == {""}
    assert abs(len(got) / len(df) - 0.5) < 0.03
    assert (got["score"] <= thr[""]).all()
    # bottom half of the pooled distribution is dominated by fr + en
    assert (got["lang"] == "de").sum() == 0


def test_quantile_filter_layout_invariant(ray_session):
    from textextract_ray.pipelines.textops import quantile_filter_ds

    df = _corpus(150)
    a, ta = quantile_filter_ds(
        _ds(df), score_col="score", group_col="lang", keep_frac=0.3
    )
    b, tb = quantile_filter_ds(
        _ds(df).repartition(11), score_col="score", group_col="lang", keep_frac=0.3
    )
    assert ta == tb  # mergeable sketch => thresholds independent of layout
    pa_ = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)


def test_quantile_filter_validation(ray_session):
    from textextract_ray.pipelines.textops import quantile_filter_ds

    df = _corpus(10)
    with pytest.raises(ValueError):
        quantile_filter_ds(_ds(df), score_col="score", keep_frac=0.0)
    with pytest.raises(ValueError):
        quantile_filter_ds(_ds(df), score_col="score", keep_frac=0.5, side="middle")
