"""Fuzzy (MinHash near-dup) decontamination against a benchmark set.

Oracle: an independent brute-force reimplementation in the test —
signatures via the public minhash functions, candidacy = sharing ≥1
LSH band, agreement = mean permutation match — with NO LSH index,
so the operator's broadcast band-map probing is checked end-to-end.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from textextract_ray.functions.text import (
    batch_shingle_hashes,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
)
from textextract_ray.stages.dedup import fuzzy_decontaminate_against

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "violet engineers measure the resonant frequency of a copper coil "
    "under nitrogen at ambient pressure during the long afternoon"
)


def _corpus():
    # doc 0: exact copy of bench 100 → agreement 1.0
    # doc 1: light paraphrase of bench 100 → high agreement
    # doc 2: unrelated → no candidacy
    # doc 3: empty → never contaminated
    # doc 4: shares a few words only → candidacy unlikely, never ≥ 0.5
    texts = [
        BASE,
        BASE.replace("lazy dog", "sleepy dog").replace("copper", "bronze"),
        "completely different subject matter about maritime navigation "
        "charts and the tidal calendars of estuary harbors in winter",
        "",
        "the quick brown fox appears here but everything else diverges "
        "into a recipe for braised leeks with mustard and cream",
    ]
    return pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})


def _bench():
    return pd.DataFrame(
        {
            "doc_id": np.array([100, 101], dtype=np.int64),
            "text": [
                BASE,
                "an entirely separate benchmark question regarding the "
                "orbital mechanics of trojan asteroids near lagrange points",
            ],
        }
    )


def _brute_force(corpus: pd.DataFrame, bench: pd.DataFrame, *, num_perm=64,
                 bands=16, k=3, threshold=0.5) -> pd.DataFrame:
    a, b = minhash_params(num_perm)
    bsigs = [
        minhash_signature(h, a, b)
        for h in batch_shingle_hashes(bench["text"].tolist(), k)
        if len(h)
    ]
    bkeys = [set(enumerate(lsh_band_keys(s, bands))) for s in bsigs]
    rows = []
    for did, text in zip(corpus["doc_id"], corpus["text"]):
        h = batch_shingle_hashes([text], k)[0]
        n_cand, max_agree = 0, 0.0
        if len(h):
            sig = minhash_signature(h, a, b)
            keys = set(enumerate(lsh_band_keys(sig, bands)))
            for bs, bk in zip(bsigs, bkeys):
                if keys & bk:
                    n_cand += 1
                    max_agree = max(max_agree, float((sig == bs).mean()))
        rows.append((did, n_cand, max_agree, max_agree >= threshold))
    return pd.DataFrame(
        rows, columns=["id", "n_candidates", "max_agreement", "contaminated"]
    )


def _run(corpus, bench, **kw):
    out = fuzzy_decontaminate_against(
        rd.from_pandas(corpus), rd.from_pandas(bench), "text", "doc_id", **kw
    )
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def test_matches_brute_force_oracle(ray_session):
    got = _run(_corpus(), _bench(), threshold=0.5)
    want = _brute_force(_corpus(), _bench(), threshold=0.5)
    pd.testing.assert_frame_equal(
        got, want.sort_values("id").reset_index(drop=True), check_dtype=False
    )


def test_planted_semantics(ray_session):
    got = _run(_corpus(), _bench(), threshold=0.5).set_index("id")
    assert got.loc[0, "max_agreement"] == 1.0 and bool(got.loc[0, "contaminated"])
    assert bool(got.loc[1, "contaminated"])  # paraphrase still flagged
    assert got.loc[1, "max_agreement"] < 1.0
    assert not bool(got.loc[2, "contaminated"]) and got.loc[2, "n_candidates"] == 0
    assert not bool(got.loc[3, "contaminated"]) and got.loc[3, "max_agreement"] == 0.0
    assert not bool(got.loc[4, "contaminated"])


def test_layout_invariance(ray_session):
    corpus = pd.concat([_corpus()] * 8, ignore_index=True)
    corpus["doc_id"] = np.arange(len(corpus), dtype=np.int64)
    a = _run(corpus, _bench())
    b_ds = rd.from_pandas(corpus).repartition(7)
    b = (
        fuzzy_decontaminate_against(b_ds, rd.from_pandas(_bench()), "text", "doc_id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_empty_bench_all_clean(ray_session):
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype="object")})
    got = _run(_corpus(), empty)
    assert not got["contaminated"].any()
    assert (got["n_candidates"] == 0).all()
    assert (got["max_agreement"] == 0.0).all()


def test_string_ids_pass_through(ray_session):
    corpus = _corpus().assign(doc_id=[f"d{i}" for i in range(5)])
    bench = _bench().assign(doc_id=["b0", "b1"])
    got = (
        fuzzy_decontaminate_against(
            rd.from_pandas(corpus), rd.from_pandas(bench), "text", "doc_id"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == ["d0", "d1", "d2", "d3", "d4"]
    assert bool(got.set_index("id").loc["d0", "contaminated"])


def test_bench_budget_guard(ray_session):
    with pytest.raises(ValueError, match="max_bench_rows"):
        fuzzy_decontaminate_against(
            rd.from_pandas(_corpus()), rd.from_pandas(_bench()),
            "text", "doc_id", max_bench_rows=1,
        )


def test_sfdir_wrapper(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from textextract_ray.pipelines.textops import fuzzy_decontaminate

    n = 60
    texts = [f"{BASE} variant {i}" if i % 7 else BASE for i in range(n)]
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    got = fuzzy_decontaminate(str(d), bench_mod=7, threshold=0.9)
    # bench side = ids % 7 == 0 (all exact BASE copies except variants…
    # id 0 is BASE); corpus ids that are BASE copies (i % 7 == 0 never in
    # corpus) — corpus docs are all "variant i" texts, near-identical to
    # BASE: every corpus doc should be flagged at threshold 0.9
    assert set(got.columns) == {"doc_id", "n_candidates", "max_agreement",
                                "contaminated"}
    assert len(got) == n - len([i for i in range(n) if i % 7 == 0])
    assert got["contaminated"].all()
