"""DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169):
brute-force single-process oracle parity (features, Laplace-smoothed
log weights, Gumbel keys, top-k), layout invariance, target exclusion,
and determinism."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

N_BUCKETS = 64  # tiny so buckets genuinely collide in the test corpus
K = 6
SEED = 11


def _corpus() -> pd.DataFrame:
    rows = [
        # target domain: fruit-speak (source 'tgt')
        (1, "tgt", "apple banana apple cherry apple date fruit salad"),
        (2, "tgt", "banana cherry banana date elderberry banana fruit"),
        (3, "tgt", "cherry fig grape apple fruit basket apple"),
        # raw pool: some fruity (should win), some not
        (10, "raw", "apple banana cherry fruit date grape"),
        (11, "raw", "stock market bond yield curve inversion"),
        (12, "raw", "banana fruit apple cherry grape elderberry"),
        (13, "raw", "kernel scheduler preemption latency jitter"),
        (14, "raw", "apple apple apple banana banana fruit"),
        (15, "raw", "weather front pressure system rainfall"),
        (16, "raw", "grape date fig fruit cherry basket salad"),
        (17, "raw", ""),  # empty doc: zero features, pure Gumbel
        (18, "raw", "Fruit! APPLE; banana... cherry?"),  # case/punct folding
        (19, "raw", "syntax parser grammar token lexer"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"])


def _brute_force(df: pd.DataFrame, k=K, n_buckets=N_BUCKETS, seed=SEED):
    """Plain-Python re-implementation over the same hash family."""
    from textextract_ray.functions.scalar import hash_utf8
    from textextract_ray.pipelines.textops import DSIR_FEATURE_SEED

    def grams(text: str) -> list[str]:
        toks = [t for t in re.split("[^a-z]+", (text or "").lower()) if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def buckets(text: str) -> np.ndarray:
        g = grams(text)
        if not g:
            return np.empty(0, np.int64)
        h = hash_utf8(pa.array(g, pa.string()), seed=DSIR_FEATURE_SEED)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    tgt_n = np.zeros(n_buckets, np.int64)
    raw_n = np.zeros(n_buckets, np.int64)
    for _, r in df.iterrows():
        b = buckets(r["text"])
        if r["source"] == "tgt":
            np.add.at(tgt_n, b, 1)
        else:
            np.add.at(raw_n, b, 1)
    lr = np.log(tgt_n + 1.0) - np.log(float(tgt_n.sum() + n_buckets))
    lr -= np.log(raw_n + 1.0) - np.log(float(raw_n.sum() + n_buckets))

    out = []
    for _, r in df[df["source"] != "tgt"].iterrows():
        b = buckets(r["text"])
        logw = float(lr[b].sum())
        u = (
            float(hash_utf8(pa.array([str(r["doc_id"])]), seed=seed)[0]) + 0.5
        ) / float(1 << 64)
        out.append((int(r["doc_id"]), logw, logw + -np.log(-np.log(u))))
    odf = pd.DataFrame(out, columns=["doc_id", "dsir_logweight", "gumbel_key"])
    return (
        odf.sort_values(["gumbel_key", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def _run(ds, **kw):
    from textextract_ray.pipelines.textops import dsir_select_ds

    return dsir_select_ds(
        ds,
        k=K,
        target_col="source",
        target_values=("tgt",),
        n_buckets=N_BUCKETS,
        seed=SEED,
        **kw,
    )


def test_dsir_matches_brute_force_oracle(ray_session):
    import ray.data as rd

    df = _corpus()
    got = _run(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    want = _brute_force(df)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["dsir_logweight"].to_numpy(), want["dsir_logweight"].to_numpy(), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["gumbel_key"].to_numpy(), want["gumbel_key"].to_numpy(), rtol=1e-9
    )
    # every fruity raw doc must out-weigh every off-domain doc (17 is the
    # empty doc: zero features -> logweight exactly 0, allowed anywhere)
    wall = _brute_force(df, k=100)
    w = dict(zip(wall["doc_id"], wall["dsir_logweight"]))
    assert min(w[d] for d in (10, 12, 14, 16, 18)) > max(
        w[d] for d in (11, 13, 15, 19)
    )


def test_dsir_layout_invariant_and_deterministic(ray_session):
    import ray.data as rd

    df = _corpus()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    a = _run(rd.from_arrow(tbl))
    b = _run(rd.from_arrow(tbl).repartition(7))
    pd.testing.assert_frame_equal(a, b)
    c = _run(rd.from_arrow(tbl))
    pd.testing.assert_frame_equal(a, c)


def test_dsir_excludes_target_and_handles_edge_cases(ray_session):
    import ray.data as rd

    df = _corpus()
    got = _run(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    assert set(got["doc_id"]) & {1, 2, 3} == set()
    # k larger than the raw pool returns the whole pool, still ranked
    all_raw = dsir_all = _run(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    )
    from textextract_ray.pipelines.textops import dsir_select_ds

    big = dsir_select_ds(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        k=100,
        target_col="source",
        target_values=("tgt",),
        n_buckets=N_BUCKETS,
        seed=SEED,
    )
    assert len(big) == (df["source"] != "tgt").sum()
    assert big["gumbel_key"].is_monotonic_decreasing
    # empty corpus
    empty = dsir_select_ds(
        rd.from_arrow(pa.Table.from_pandas(df.iloc[0:0], preserve_index=False)),
        k=5,
        target_col="source",
        target_values=("tgt",),
        n_buckets=N_BUCKETS,
        seed=SEED,
    )
    assert len(empty) == 0 and list(empty.columns) == [
        "doc_id",
        "dsir_logweight",
        "gumbel_key",
    ]


def test_dsir_over_documents_table(ray_session, sf_dir):
    from textextract_ray.pipelines.textops import dsir_select

    got = dsir_select(sf_dir, k=20, target_values=("src0",), seed=2)
    assert len(got) == 20
    assert got["gumbel_key"].is_monotonic_decreasing
