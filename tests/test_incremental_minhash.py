"""Incremental cross-run MinHash near-dup: prior survivors always win
(rank-0 undroppable, keep preference prior-first), increment-vs-one-shot
equivalence, index growth across runs, empty bootstrap, and empty-doc
exclusion."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _doc(i, variant=""):
    """Distinct ``i`` → near-disjoint shingle sets (Jaccard ≈ 0);
    a ``variant`` suffix keeps Jaccard near 1."""
    rng = np.random.RandomState(2000 + i)
    words = [f"w{i}x{j}t{(i * 17 + j * 5) % 991}" for j in rng.choice(300, 80, replace=False)]
    return " ".join(words) + (" " + variant if variant else "")


TH = 0.7


def test_incremental_minhash_three_runs(ray_session, tmp_path):
    from textextract_ray.stages.dedup import (
        append_minhash_index,
        incremental_minhash_near_dups,
    )

    idx = str(tmp_path / "mh_index")

    # run 1: 0..9, doc 1 is a near-copy of doc 0
    run1 = [(i, _doc(i)) for i in range(10)]
    run1[1] = (1, _doc(0, "slightly"))
    a1, idx1 = incremental_minhash_near_dups(_mk(run1), idx, threshold=TH)
    a1df = a1.to_pandas()
    assert list(a1df["id"]) == [1] and list(a1df["keep_id"]) == [0]
    assert append_minhash_index(idx1, idx) == 9
    assert glob.glob(idx + "/index-*.parquet")

    # run 2: 20 near-dups prior 0; 22/23 near-dup each other; 21/24 new
    run2 = [
        (20, _doc(0, "almost")),
        (21, _doc(100)),
        (22, _doc(200)),
        (23, _doc(200, "ish")),
        (24, _doc(300)),
    ]
    a2, idx2 = incremental_minhash_near_dups(_mk(run2), idx, threshold=TH)
    a2df = a2.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(a2df["id"]) == [20, 23]
    assert list(a2df["keep_id"]) == [0, 22]  # prior wins even vs id 20 < 22
    assert not set(a2df["id"]) & set(range(10))  # prior never dropped
    assert append_minhash_index(idx2, idx) == 3

    # run 3: another copy of 200's doc must map to 22 (the survivor),
    # not 23 (which was dropped and is NOT in the index)
    a3, idx3 = incremental_minhash_near_dups(
        _mk([(30, _doc(200, "variant")), (31, _doc(400))]), idx, threshold=TH
    )
    a3df = a3.to_pandas()
    assert list(a3df["id"]) == [30] and list(a3df["keep_id"]) == [22]
    assert append_minhash_index(idx3, idx) == 1


def test_increment_matches_one_shot(ray_session, tmp_path):
    from textextract_ray.stages.dedup import (
        append_minhash_index,
        incremental_minhash_near_dups,
        minhash_duplicate_assignments,
    )

    # same corpus through (a) one shot and (b) two increments, where
    # every cluster's smallest id arrives in run 1 — the two paths must
    # agree exactly (prior-first == min-id when priors ARE the minima)
    docs = [(i, _doc(i)) for i in range(8)]
    docs += [(10 + i, _doc(i, "copyA")) for i in range(4)]
    docs += [(20 + i, _doc(i, "copyB")) for i in range(2)]
    one = (
        minhash_duplicate_assignments(_mk(docs), "text", "doc_id", threshold=TH)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    idx = str(tmp_path / "mh_idx2")
    r1 = [d for d in docs if d[0] < 10]
    r2 = [d for d in docs if d[0] >= 10]
    a1, i1 = incremental_minhash_near_dups(_mk(r1), idx, threshold=TH)
    append_minhash_index(i1, idx)
    a2, i2 = incremental_minhash_near_dups(_mk(r2), idx, threshold=TH)
    inc = (
        pd.concat([a1.to_pandas(), a2.to_pandas()])
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, inc)


def test_bootstrap_and_empty_docs(ray_session, tmp_path):
    from textextract_ray.stages.dedup import (
        append_minhash_index,
        incremental_minhash_near_dups,
    )

    idx = str(tmp_path / "mh_idx3")
    rows = [(0, _doc(0)), (1, ""), (2, "   "), (3, _doc(3))]
    a, new_idx = incremental_minhash_near_dups(_mk(rows), idx, threshold=TH)
    assert a.count() == 0
    # empty docs carry no signature: the index holds only 0 and 3
    assert append_minhash_index(new_idx, idx) == 2
    got = sorted(
        pd.concat(
            [pd.read_parquet(f) for f in glob.glob(idx + "/index-*.parquet")]
        )["id"]
    )
    assert got == [0, 3]
