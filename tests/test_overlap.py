"""Cross-corpus overlap via bottom-k sketches (Broder 1997 / Cohen &
Kaplan 2007): exactness when k covers the union, bounded estimator
error below it, layout invariance, determinism, and disjoint/identical
edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _corpus() -> pd.DataFrame:
    """Three 'dumps': A and B share exactly 30 of 60 distinct docs
    (J = 30/90 = 1/3); C is disjoint from both; D duplicates A
    exactly (J = 1). Duplicate rows within a dump must not distort
    distinct-set semantics."""
    rows = []
    i = 0

    def doc(n):
        return f"document body number {n} with some distinct words {n * 7}"

    for n in range(60):  # A: docs 0..59
        rows.append((i, "A", doc(n)))
        i += 1
    for n in range(30, 90):  # B: docs 30..89 (30 shared with A)
        rows.append((i, "B", doc(n)))
        i += 1
    for n in range(200, 240):  # C: disjoint
        rows.append((i, "C", doc(n)))
        i += 1
    for n in range(60):  # D == A, with every doc duplicated twice
        rows.append((i, "D", doc(n)))
        i += 1
        rows.append((i, "D", doc(n)))
        i += 1
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"])


def _run(df, k, **kw):
    import ray.data as rd

    from textextract_ray.pipelines.textops import corpus_overlap_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return corpus_overlap_ds(ds, k=k, **kw)


def test_overlap_exact_when_k_covers_union(ray_session):
    got = _run(_corpus(), k=512)
    m = {(r.group_a, r.group_b): r.est_jaccard for r in got.itertuples()}
    assert m[("A", "B")] == np.round(30 / 90, 6)
    assert m[("A", "C")] == 0.0
    assert m[("B", "C")] == 0.0
    assert m[("A", "D")] == 1.0
    assert m[("C", "D")] == 0.0
    # sketch sizes = distinct doc counts (duplicates collapsed)
    sizes = dict(zip(got["group_a"], got["sketch_a"]))
    assert sizes["A"] == 60
    d_size = got.loc[got["group_b"] == "D", "sketch_b"].iloc[0]
    assert d_size == 60


def test_overlap_estimator_bounded_error_small_k(ray_session):
    got = _run(_corpus(), k=48)  # union A∪B = 90 distinct > k
    m = {(r.group_a, r.group_b): r.est_jaccard for r in got.itertuples()}
    # bottom-k estimator with k=48: std err ~ sqrt(J(1-J)/k) ~ 0.068
    assert abs(m[("A", "B")] - 1 / 3) < 0.2
    assert m[("A", "C")] == 0.0  # disjoint stays exactly 0
    assert m[("A", "D")] == 1.0  # identical stays exactly 1


def test_overlap_layout_invariant_and_deterministic(ray_session):
    df = _corpus()
    a = _run(df, k=64)
    b = _run(df.sample(frac=1.0, random_state=3).reset_index(drop=True), k=64)
    pd.testing.assert_frame_equal(a, b)
    import ray.data as rd

    from textextract_ray.pipelines.textops import corpus_overlap_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(9)
    c = corpus_overlap_ds(ds, k=64)
    pd.testing.assert_frame_equal(a, c)


def test_overlap_single_group_and_empty(ray_session):
    df = _corpus()
    one = _run(df[df["source"] == "A"].reset_index(drop=True), k=64)
    assert len(one) == 0
    empty = _run(df.iloc[0:0], k=64)
    assert len(empty) == 0
    assert list(empty.columns) == [
        "group_a",
        "group_b",
        "est_jaccard",
        "sketch_a",
        "sketch_b",
    ]
