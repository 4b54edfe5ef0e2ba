"""Incremental cross-run SimHash near-dup: prior survivors always win
(rank-0 rows structurally undroppable), increment-vs-one-shot
equivalence on clean clusters, index append idempotency, multi-run
growth, and empty-index bootstrap."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]


def _doc(i, variant=""):
    """Docs for different ``i`` share almost no vocabulary (distinct
    word subsets → unrelated hamming ≥ 23 measured), while a planted
    one-word ``variant`` stays within hamming 5 of its base."""
    rng = np.random.RandomState(1000 + i)
    words = [
        _WORDS[j % 26] + str((i * 31 + j * 7) % 997)
        for j in rng.choice(200, size=60, replace=False)
    ]
    return " ".join(words) + (" " + variant if variant else "")


RADIUS = 5


def test_incremental_neardup_three_runs(ray_session, tmp_path):
    from textextract_ray.stages.dedup import (
        append_simhash_index,
        incremental_simhash_near_dups,
        simhash_duplicate_assignments,
    )

    idx = str(tmp_path / "simhash_index")

    # run 1: docs 0..9, where 1 is a near-copy of 0 (one word changed)
    run1 = [(i, _doc(i)) for i in range(10)]
    run1[1] = (1, _doc(0, "slightly"))
    a1, new_idx1 = incremental_simhash_near_dups(_mk(run1), idx, max_hamming=RADIUS)
    a1df = a1.to_pandas()
    assert list(a1df["id"]) == [1] and list(a1df["keep_id"]) == [0]
    n1 = append_simhash_index(new_idx1, idx)
    assert n1 == 9  # 10 docs minus the dropped near-copy
    assert glob.glob(idx + "/index-*.parquet")

    # run 2: 20..24; 20 near-dups prior survivor 0; 22/23 near-dup each
    # other; 21/24 unique
    run2 = [
        (20, _doc(0, "almost")),
        (21, _doc(100)),
        (22, _doc(200)),
        (23, _doc(200, "ish")),
        (24, _doc(300)),
    ]
    a2, new_idx2 = incremental_simhash_near_dups(_mk(run2), idx, max_hamming=RADIUS)
    a2df = a2.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(a2df["id"]) == [20, 23]
    assert list(a2df["keep_id"]) == [0, 22]  # prior survivor wins; 22 wins 23
    # prior ids NEVER appear in the drop column
    assert not set(a2df["id"]) & set(range(10))
    n2 = append_simhash_index(new_idx2, idx)
    assert n2 == 3  # 21, 22, 24 survive

    # equivalence on clean clusters: one-shot over run1+run2 restricted
    # to run-2 ids gives the same drops
    oneshot = (
        simhash_duplicate_assignments(_mk(run1 + run2), "text", "doc_id", RADIUS)
        .to_pandas()
    )
    oneshot2 = oneshot[oneshot["id"] >= 20].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a2df, oneshot2.sort_values("id").reset_index(drop=True)
    )

    # run 3: a near-copy of run-2 survivor 22 dedups against the grown
    # index; re-appending the same increment rewrites the same shards
    run3 = [(30, _doc(200, "very")), (31, _doc(400))]
    a3, new_idx3 = incremental_simhash_near_dups(_mk(run3), idx, max_hamming=RADIUS)
    a3df = a3.to_pandas()
    assert list(a3df["id"]) == [30] and list(a3df["keep_id"]) == [22]
    before = sorted(glob.glob(idx + "/index-*.parquet"))
    append_simhash_index(new_idx3, idx)
    append_simhash_index(new_idx3, idx)  # idempotent rewrite
    after = sorted(glob.glob(idx + "/index-*.parquet"))
    assert len(after) == len(before) + 1


def test_incremental_neardup_empty_bootstrap(ray_session, tmp_path):
    from textextract_ray.stages.dedup import incremental_simhash_near_dups

    idx = str(tmp_path / "fresh_index")  # does not exist yet
    docs = [(0, _doc(0)), (1, _doc(1))]
    a, new_idx = incremental_simhash_near_dups(_mk(docs), idx)
    assert a.count() == 0
    assert new_idx.count() == 2
