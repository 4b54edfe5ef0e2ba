"""Public join utilities: broadcast_lookup_join_ds (dimension attach)
and interval_join_ds (keyed point-in-interval) — DuckDB-oracle parity,
null/contract semantics, layout invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, repartition=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(repartition) if repartition else ds


# --- broadcast_lookup_join_ds --------------------------------------------------


def _lookup_frames():
    rng = np.random.RandomState(5)
    lhs = pd.DataFrame(
        {
            "host": [f"h{i}.com" if i % 9 else None for i in range(80)],
            "big_id": (rng.randint(0, 2**62, 80).astype(np.int64)),
            "v": range(80),
        }
    )
    dim = pd.DataFrame(
        {
            "host": [f"h{i}.com" for i in range(0, 60, 3)] + [None],
            "policy": [f"p{i}" for i in range(0, 60, 3)] + ["null-policy"],
            "weight": list(np.linspace(0.0, 1.0, 20).round(3)) + [9.9],
        }
    )
    return lhs, dim


def test_lookup_join_duckdb_parity(ray_session):
    from textextract_ray.pipelines.relational import broadcast_lookup_join_ds

    lhs, dim = _lookup_frames()
    lds, dds = _ds(lhs, 4), _ds(dim)

    inner = broadcast_lookup_join_ds(lds, dds, "host").to_pandas()
    want_inner = duckdb.sql(
        "SELECT l.*, d.policy, d.weight FROM lhs l JOIN dim d USING (host) "
        "ORDER BY v"
    ).df()
    pd.testing.assert_frame_equal(
        inner.sort_values("v").reset_index(drop=True), want_inner
    )
    # int64 ids survive exactly (no pandas float widening)
    assert inner["big_id"].dtype == np.int64
    assert set(inner["big_id"]).issubset(set(lhs["big_id"]))

    outer = broadcast_lookup_join_ds(lds, dds, "host", how="left").to_pandas()
    want_outer = duckdb.sql(
        "SELECT l.*, d.policy, d.weight FROM lhs l LEFT JOIN dim d USING (host) "
        "ORDER BY v"
    ).df()
    pd.testing.assert_frame_equal(
        outer.sort_values("v").reset_index(drop=True), want_outer
    )
    # null left keys survive the left join with null attachments and
    # never match the dim's null row
    nulls = outer[outer["host"].isna()]
    assert len(nulls) and nulls["policy"].isna().all()


def test_lookup_join_contracts(ray_session):
    from textextract_ray.pipelines.relational import broadcast_lookup_join_ds

    lhs, dim = _lookup_frames()
    lds = _ds(lhs)

    dup = pd.concat([dim, dim.iloc[[0]]], ignore_index=True)
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_lookup_join_ds(lds, _ds(dup), "host").count()

    with pytest.raises(ValueError, match="budget_rows"):
        broadcast_lookup_join_ds(lds, _ds(dim), "host", budget_rows=2).count()

    with pytest.raises(ValueError, match="how"):
        broadcast_lookup_join_ds(lds, _ds(dim), "host", how="outer")

    # dim_cols subset attaches only what was asked
    sub = broadcast_lookup_join_ds(
        lds, _ds(dim), "host", dim_cols=["policy"]
    ).to_pandas()
    assert list(sub.columns) == ["host", "big_id", "v", "policy"]


# --- interval_join_ds ----------------------------------------------------------


def _interval_frames(seed=7, n_pts=400, n_keys=12):
    rng = np.random.RandomState(seed)
    ivs = []
    for k in range(n_keys):
        t = 0
        for _ in range(rng.randint(0, 5)):
            start = t + rng.randint(0, 20)
            end = start + rng.randint(1, 30)
            ivs.append((f"u{k}", start, end, f"plan_{k}_{start}"))
            t = end + rng.randint(0, 10)  # gaps allowed, no overlap
    intervals = pd.DataFrame(ivs, columns=["user", "t_start", "t_end", "plan"])
    points = pd.DataFrame(
        {
            "user": [f"u{rng.randint(0, n_keys + 2)}" for _ in range(n_pts)],
            "ts": rng.randint(0, 150, n_pts),
            "event_id": np.arange(n_pts, dtype=np.int64),
        }
    )
    return points, intervals


def test_interval_join_duckdb_parity(ray_session):
    from textextract_ray.pipelines.relational import interval_join_ds

    points, intervals = _interval_frames()
    got = (
        interval_join_ds(
            _ds(points, 5),
            _ds(intervals, 3),
            key_col="user",
            ts_col="ts",
            start_col="t_start",
            end_col="t_end",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT p.user, p.ts, p.event_id, i.t_start, i.t_end, i.plan "
        "FROM points p JOIN intervals i ON p.user = i.user "
        "AND p.ts >= i.t_start AND p.ts < i.t_end ORDER BY event_id"
    ).df()
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    assert len(got) > 20  # the fixture actually exercises matches


def test_interval_join_edges_and_layout(ray_session):
    from textextract_ray.pipelines.relational import interval_join_ds

    points, intervals = _interval_frames(seed=23)
    kw = dict(key_col="user", ts_col="ts", start_col="t_start", end_col="t_end")

    a = interval_join_ds(_ds(points), _ds(intervals), **kw).to_pandas()
    b = interval_join_ds(
        _ds(points.sample(frac=1.0, random_state=1), 7),
        _ds(intervals.sample(frac=1.0, random_state=2), 2),
        **kw,
    ).to_pandas()
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )

    # boundary semantics: ts == start matches, ts == end does not
    pts = pd.DataFrame({"user": ["x", "x"], "ts": [10, 20], "event_id": [0, 1]})
    ivl = pd.DataFrame(
        {"user": ["x"], "t_start": [10], "t_end": [20], "plan": ["p"]}
    )
    got = interval_join_ds(_ds(pts), _ds(ivl), **kw).to_pandas()
    assert got["event_id"].tolist() == [0]

    # overlap contract raises with the offending key
    bad = pd.DataFrame(
        {
            "user": ["y", "y"],
            "t_start": [0, 5],
            "t_end": [10, 15],
            "plan": ["a", "b"],
        }
    )
    with pytest.raises(Exception, match="overlap"):
        interval_join_ds(_ds(pts), _ds(bad.assign(user="x")), **kw).count()

    # empty sides
    assert (
        interval_join_ds(_ds(pts.iloc[:0]), _ds(ivl), **kw).count() == 0
    )
    assert (
        interval_join_ds(_ds(pts), _ds(ivl.iloc[:0]), **kw).count() == 0
    )


# --- hash_join_ds ---------------------------------------------------------------


def _fact_frames():
    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": [int(x) if x % 13 else None for x in rng.randint(0, 40, 120)],
            "region": [f"r{i % 3}" for i in range(120)],
            "lv": np.arange(120, dtype=np.int64),
            "big": rng.randint(0, 2**62, 120).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": [int(x) if x % 7 else None for x in rng.randint(0, 50, 90)],
            "region": [f"r{i % 4}" for i in range(90)],
            "rv": np.arange(90, dtype=np.int64) * 10,
        }
    )
    return left, right


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)[sorted(df.columns)]


def test_hash_join_inner_duckdb_parity(ray_session):
    from textextract_ray.pipelines.relational import hash_join_ds

    lhs, rhs = _fact_frames()
    got = hash_join_ds(_ds(lhs, 5), _ds(rhs, 3), "k").to_pandas()
    want = duckdb.sql(
        "SELECT l.k, l.region AS region_l, l.lv, l.big, "
        "r.region AS region_r, r.rv "
        "FROM lhs l JOIN rhs r USING (k)"
    ).df()
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"]),
        check_dtype=False,
    )
    # N→M fan-out really happened (multiple rows per key both sides)
    assert len(got) > got["k"].nunique()
    # int64 facts survive the bucket merge exactly
    assert got["big"].dtype == np.int64


def test_hash_join_left_nulls_and_types(ray_session):
    from textextract_ray.pipelines.relational import hash_join_ds

    lhs, rhs = _fact_frames()
    out = hash_join_ds(_ds(lhs, 5), _ds(rhs, 3), "k", how="left")
    got = out.to_pandas()
    want = duckdb.sql(
        "SELECT l.k, l.region AS region_l, l.lv, l.big, "
        "r.region AS region_r, r.rv "
        "FROM lhs l LEFT JOIN rhs r ON l.k = r.k"
    ).df()
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"]),
        check_dtype=False,
    )
    # null-key left rows survive with null right columns
    nk = got[got["k"].isna()]
    assert len(nk) == lhs["k"].isna().sum()
    assert nk["rv"].isna().all()
    # the ARROW schema keeps int64 (null-padded, never float64-widened);
    # pandas rendering of nullable ints as float64 is a display choice
    sch = out.schema()
    assert str(sch.base_schema.field("rv").type) == "int64"
    assert str(sch.base_schema.field("big").type) == "int64"


def test_hash_join_multikey_and_layout(ray_session):
    from textextract_ray.pipelines.relational import hash_join_ds

    lhs, rhs = _fact_frames()
    a = hash_join_ds(_ds(lhs, 2), _ds(rhs, 9), ["k", "region"]).to_pandas()
    b = hash_join_ds(_ds(lhs, 11), _ds(rhs, 1), ["k", "region"]).to_pandas()
    want = duckdb.sql(
        "SELECT l.k, l.region, l.lv, l.big, r.rv "
        "FROM lhs l JOIN rhs r USING (k, region)"
    ).df()
    key = ["k", "region", "lv", "rv"]
    pd.testing.assert_frame_equal(_sorted(a, key), _sorted(want, key),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(_sorted(a, key), _sorted(b, key))


def test_hash_join_contracts(ray_session):
    from textextract_ray.pipelines.relational import hash_join_ds

    lhs, rhs = _fact_frames()
    with pytest.raises(ValueError, match="how"):
        hash_join_ds(_ds(lhs), _ds(rhs), "k", how="outer")
    with pytest.raises(ValueError, match="missing"):
        hash_join_ds(_ds(lhs), _ds(rhs), "lv")
    # disjoint keys -> empty inner result
    rhs2 = rhs.assign(k=rhs["k"] + 1000)
    assert hash_join_ds(_ds(lhs), _ds(rhs2), "k").count() == 0


def test_hash_join_left_snowflake_ids_exact(ray_session):
    # regression: values > 2^53 must survive a left join whose bucket
    # also holds unmatched rows (pandas float64 would round them)
    from textextract_ray.pipelines.relational import hash_join_ds

    big = 4611686018427400249  # > 2^53, not float64-representable
    lhs = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
    rhs = pd.DataFrame({"k": [1], "rv": np.array([big], dtype=np.int64)})
    rows = sorted(
        hash_join_ds(_ds(lhs), _ds(rhs), "k", how="left", num_buckets=1).take_all(),
        key=lambda r: r["k"],
    )
    # read through Arrow rows: a pandas pull would re-render the
    # nullable int64 as float64 at the DISPLAY layer
    assert rows[0]["rv"] == big
    assert rows[1]["rv"] is None
