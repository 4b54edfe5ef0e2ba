"""One-pass corpus profile: exact-field parity with pandas, HLL and
quantile tolerance, host distincts, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _corpus() -> pd.DataFrame:
    rows = []
    i = 0
    for lang, n in (("en", 300), ("de", 120)):
        for j in range(n):
            words = ["w%d" % ((j * 13 + t) % 50) for t in range(5 + j % 40)]
            text = " ".join(words) if j % 17 else ""
            url = f"https://host{j % 23}.example/{lang}/{i}"
            rows.append((i, lang, text, url))
            i += 1
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text", "url"])


def _run(df, repartition=None, **kw):
    import ray.data as rd

    from textextract_ray.pipelines.textops import corpus_profile_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    return corpus_profile_ds(ds, url_col="url", **kw)


def test_profile_exact_fields_match_pandas(ray_session):
    df = _corpus()
    prof = _run(df)
    assert set(prof) == {"en", "de"}
    for lang, sub in df.groupby("lang"):
        p = prof[lang]
        ntok = sub["text"].str.split().str.len()
        assert p["n_docs"] == len(sub)
        assert p["n_tokens"] == int(ntok.sum())
        assert p["n_bytes"] == int(sub["text"].str.len().sum())
        assert p["n_empty"] == int((ntok == 0).sum())
        # HLL within its ~2% nominal error (generous 6% bound)
        exact_texts = sub["text"].nunique()
        assert abs(p["approx_distinct_texts"] - exact_texts) <= 0.06 * exact_texts + 1
        exact_hosts = sub["url"].str.extract(r"://([^/]+)")[0].nunique()
        assert (
            abs(p["approx_distinct_hosts"] - exact_hosts) <= 0.06 * exact_hosts + 1
        )
        # token-length quantiles within sketch tolerance of the exact
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            exact = float(np.quantile(ntok, q))
            got = p["token_quantiles"][name]
            assert abs(got - exact) <= max(0.02 * exact, 1.0), (lang, name)


def test_profile_layout_invariant(ray_session):
    df = _corpus()
    a = _run(df)
    b = _run(df.sample(frac=1.0, random_state=7).reset_index(drop=True), repartition=9)
    assert a == b  # every partial commutes -> byte-equal profile
