"""Dump-over-dump crawl delta: pandas brute-force parity on a planted
two-dump url set, include_unchanged semantics, within-side duplicate
collapse, layout invariance, and empty-side edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _dumps():
    old = [
        ("https://a.com/1", b"<html>same</html>"),
        ("https://a.com/2", b"<html>old body</html>"),
        ("https://a.com/3", b"<html>gone</html>"),
        ("https://b.com/x", b"<html>stable</html>"),
    ]
    new = [
        ("https://a.com/1", b"<html>same</html>"),
        ("https://a.com/2", b"<html>new body</html>"),
        ("https://a.com/4", b"<html>fresh</html>"),
        ("https://b.com/x", b"<html>stable</html>"),
        # stray duplicate within the new dump: collapses by max hash
        ("https://a.com/4", b"<html>fresh</html>"),
    ]
    mk = lambda rows: pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    return mk(old), mk(new)


def _brute(old: pa.Table, new: pa.Table, include_unchanged: bool) -> pd.DataFrame:
    o = {u: h for u, h in zip(old["url"].to_pylist(), old["html"].to_pylist())}
    n = {u: h for u, h in zip(new["url"].to_pylist(), new["html"].to_pylist())}
    rows = []
    for u in sorted(set(o) | set(n)):
        if u not in o:
            c = "added"
        elif u not in n:
            c = "removed"
        elif o[u] != n[u]:
            c = "changed"
        else:
            c = "unchanged"
        if include_unchanged or c != "unchanged":
            rows.append((u, c))
    return pd.DataFrame(rows, columns=["url", "change"])


def _run(old: pa.Table, new: pa.Table, repartition=None, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.extract_pipeline import crawl_delta_ds

    o, n = rd.from_arrow(old), rd.from_arrow(new)
    if repartition:
        o, n = o.repartition(repartition), n.repartition(repartition)
    out = crawl_delta_ds(o, n, **kw).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def test_crawl_delta_matches_brute_force(ray_session):
    old, new = _dumps()
    got = _run(old, new)
    want = _brute(old, new, include_unchanged=False)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["change"]) == {"added", "removed", "changed"}


def test_crawl_delta_include_unchanged(ray_session):
    old, new = _dumps()
    got = _run(old, new, include_unchanged=True)
    want = _brute(old, new, include_unchanged=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["change"] == "unchanged").sum() == 2


def test_crawl_delta_layout_invariant(ray_session):
    old, new = _dumps()
    a = _run(old, new, include_unchanged=True)
    # shuffle row order within each dump and over-partition
    rng = np.random.RandomState(4)
    perm_o = rng.permutation(old.num_rows)
    perm_n = rng.permutation(new.num_rows)
    b = _run(old.take(perm_o), new.take(perm_n), repartition=3,
             include_unchanged=True)
    pd.testing.assert_frame_equal(a, b)


def test_crawl_delta_empty_old_side(ray_session):
    old, new = _dumps()
    empty = old.slice(0, 0)
    got = _run(empty, new)
    assert (got["change"] == "added").all()
    assert len(got) == 4  # the stray duplicate collapses
