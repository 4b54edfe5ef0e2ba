"""Z-order multi-column clustering: pruning on EITHER dimension,
exact results, null semantics, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.pipelines.storage import (
    read_clustered_multi,
    write_clustered_multi,
)


def _frame(n: int = 6000) -> pd.DataFrame:
    # two independent uniform dims: user id and (integer) timestamp
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {
            "user_id": rng.randint(0, 1000, n).astype(np.int64),
            "ts": rng.randint(0, 100_000, n).astype(np.int64),
            "payload": [f"p{i}" for i in range(n)],
        }
    )


def _write(tmp_path, df, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    out = str(tmp_path / "z")
    write_clustered_multi(ds, out, ["user_id", "ts"], num_ranges=16, **kw)
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["user_id", "ts", "payload"]).reset_index(drop=True)


def test_prunes_on_either_dimension_exactly(ray_session, tmp_path):
    df = _frame()
    out = _write(tmp_path, df)

    # dim 1 predicate
    got = read_clustered_multi(out, user_id=(100, 200)).to_pandas()
    want = df[(df.user_id >= 100) & (df.user_id < 200)]
    pd.testing.assert_frame_equal(_sorted(got)[df.columns.tolist()], _sorted(want))
    r1, total = read_clustered_multi.last_pruning
    assert r1 < total

    # dim 2 predicate — the case single-key clustering can't prune
    got = read_clustered_multi(out, ts=(10_000, 20_000)).to_pandas()
    want = df[(df.ts >= 10_000) & (df.ts < 20_000)]
    pd.testing.assert_frame_equal(_sorted(got)[df.columns.tolist()], _sorted(want))
    r2, _ = read_clustered_multi.last_pruning
    assert r2 < total

    # box predicate prunes at least as hard as either side alone
    got = read_clustered_multi(
        out, user_id=(100, 200), ts=(10_000, 20_000)
    ).to_pandas()
    want = df[
        (df.user_id >= 100)
        & (df.user_id < 200)
        & (df.ts >= 10_000)
        & (df.ts < 20_000)
    ]
    pd.testing.assert_frame_equal(_sorted(got)[df.columns.tolist()], _sorted(want))
    r3, _ = read_clustered_multi.last_pruning
    assert r3 <= min(r1, r2)

    # unbounded read returns everything; half-open sides are exact
    assert read_clustered_multi(out).count() == len(df)
    lo_only = read_clustered_multi(out, ts=(95_000, None)).to_pandas()
    assert set(lo_only.ts) == set(df.ts[df.ts >= 95_000])


def test_nulls_excluded_by_bounded_reads(ray_session, tmp_path):
    df = _frame(2000)
    df.loc[df.index[:50], "ts"] = None
    df["ts"] = df["ts"].astype("Int64")
    out = _write(tmp_path, df)
    got = read_clustered_multi(out, ts=(0, None)).to_pandas()
    assert len(got) == len(df) - 50 and got["ts"].notna().all()
    # null rows still present in the unbounded read
    assert read_clustered_multi(out).count() == len(df)


def test_layout_invariance_and_guards(ray_session, tmp_path):
    import ray.data as rd

    df = _frame(2000)
    t = pa.Table.from_pandas(df, preserve_index=False)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    write_clustered_multi(rd.from_arrow(t).repartition(3), out_a, ["user_id", "ts"])
    write_clustered_multi(rd.from_arrow(t).repartition(11), out_b, ["user_id", "ts"])
    ga = _sorted(read_clustered_multi(out_a, user_id=(0, 500)).to_pandas())
    gb = _sorted(read_clustered_multi(out_b, user_id=(0, 500)).to_pandas())
    pd.testing.assert_frame_equal(ga, gb)

    with pytest.raises(ValueError, match="not in key_cols"):
        read_clustered_multi(out_a, payload=("a", "b"))
    with pytest.raises(ValueError, match="bits"):
        write_clustered_multi(
            rd.from_arrow(t), str(tmp_path / "c"), ["user_id", "ts"], bits=32
        )


def _mk_pair(tmp_path, n_l=4000, n_r=1500):
    """Two co-partitioned layouts sharing the boundary list."""
    import ray.data as rd

    from textextract_ray.pipelines.storage import (
        cluster_boundaries,
        write_clustered,
    )

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 2000, n_l).astype(np.int64),
            "lv": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.randint(0, 2000, n_r).astype(np.int64),
            "rv": [f"r{i}" for i in range(n_r)],
        }
    ).drop_duplicates("rk")
    ld, rd_ = str(tmp_path / "L"), str(tmp_path / "R")
    write_clustered(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(6),
        ld,
        "k",
        num_ranges=8,
    )
    write_clustered(
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(4),
        rd_,
        "rk",
        boundaries=cluster_boundaries(ld),
    )
    return left, right, ld, rd_


def test_clustered_join_inner_and_left_exact(ray_session, tmp_path):
    from textextract_ray.pipelines.storage import clustered_join

    left, right, ld, rd_ = _mk_pair(tmp_path)

    got = (
        clustered_join(ld, rd_)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk", how="inner")
        .drop(columns=["rk"])  # Arrow join coalesces the right key (USING)
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    got_l = (
        clustered_join(ld, rd_, how="left")
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want_l = (
        left.merge(right, left_on="k", right_on="rk", how="left")
        .drop(columns=["rk"])
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(got_l) == len(want_l) == len(left)
    pd.testing.assert_frame_equal(
        got_l[["k", "lv"]], want_l[["k", "lv"]]
    )
    # unmatched left rows carry null right values
    assert got_l["rv"].isna().equals(want_l["rv"].isna())


def test_clustered_join_guards(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from textextract_ray.pipelines.storage import clustered_join, write_clustered

    left, right, ld, rd_ = _mk_pair(tmp_path)
    # a layout with its OWN boundaries is not co-partitioned
    other = str(tmp_path / "other")
    write_clustered(
        rd.from_arrow(
            pa.Table.from_pandas(right, preserve_index=False)
        ),
        other,
        "rk",
        num_ranges=3,
    )
    with pytest.raises(ValueError, match="not co-partitioned"):
        clustered_join(ld, other)
    with pytest.raises(ValueError, match="inner|left"):
        clustered_join(ld, rd_, how="outer")


def test_clustered_join_left_empty_right_raises(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from textextract_ray.pipelines.storage import (
        cluster_boundaries,
        clustered_join,
        write_clustered,
    )

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "lv": np.arange(100)})
    ld = str(tmp_path / "L")
    write_clustered(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)), ld, "k"
    )
    # a co-partitioned right layout with a manifest but zero data files
    rd_dir = str(tmp_path / "R")
    import json as _json
    import os as _os

    _os.makedirs(rd_dir)
    with open(_os.path.join(ld, "_cluster_manifest.json")) as fh:
        m = _json.load(fh)
    m["key_col"] = "rk"
    with open(_os.path.join(rd_dir, "_cluster_manifest.json"), "w") as fh:
        _json.dump(m, fh)
    with pytest.raises(ValueError, match="no data files"):
        clustered_join(ld, rd_dir, how="left")
    # inner join over the same empty right is simply empty
    assert clustered_join(ld, rd_dir).count() == 0
