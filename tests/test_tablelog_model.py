"""Model-based randomized test for the versioned-table commit log:
a random sequence of append / overwrite / merge / delete / compact /
rollforward ops is mirrored against a plain pandas model; after every
op the table head must equal the model exactly, and a random retained
version must equal its recorded historical state (time travel)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from textextract_ray.pipelines.tablelog import (
    read_table_at,
    table_append,
    table_create,
    table_delete_keys,
    table_merge,
    table_overwrite,
)


def _frame(rng, lo_pool: int) -> pd.DataFrame:
    n = int(rng.randint(1, 40))
    ks = rng.randint(0, lo_pool, n)
    ks = np.unique(ks)  # merge semantics assume a deduped upsert side
    return pd.DataFrame(
        {
            "k": ks.astype("int64"),
            "txt": [f"v{int(rng.randint(0, 1_000_000))}" for _ in ks],
        }
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    # appends may duplicate k across versions, so the total order for
    # comparison must include txt
    return (
        df.sort_values(["k", "txt"]).reset_index(drop=True)[["k", "txt"]].astype(
            {"k": "int64", "txt": "str"}
        )
    )


def test_random_op_sequences_match_pandas_model(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.RandomState(2026)
    t = str(tmp_path / "tbl")
    table_create(t)
    model = pd.DataFrame({"k": pd.Series([], dtype="int64"), "txt": []})
    snapshots = {0: model.copy()}

    for step in range(18):
        op = rng.choice(["append", "overwrite", "merge", "delete"], p=[0.4, 0.15, 0.3, 0.15])
        if op == "append":
            df = _frame(rng, 200)
            if rng.rand() < 0.25 and len(model):
                # adversarial arm: a type-mismatched append (same names,
                # string k) must be REJECTED at commit and leave the
                # table byte-identical to the model (r5 type guard)
                bad = df.copy()
                bad["k"] = bad["k"].astype(str)
                import pytest as _pytest

                with _pytest.raises(ValueError, match="types mismatch"):
                    table_append(t, rd.from_pandas(bad), stats_cols=["k"])
                pd.testing.assert_frame_equal(
                    _norm(read_table_at(t).to_pandas()), _norm(model)
                )
            v = table_append(t, rd.from_pandas(df), stats_cols=["k"])
            model = pd.concat([model, df], ignore_index=True)
        elif op == "overwrite":
            df = _frame(rng, 200)
            v = table_overwrite(t, rd.from_pandas(df), stats_cols=["k"])
            model = df.copy()
        elif op == "merge":
            df = _frame(rng, 200)
            v = table_merge(t, rd.from_pandas(df), "k", stats_cols=["k"])
            model = pd.concat(
                [model[~model.k.isin(df.k)], df], ignore_index=True
            )
        else:  # delete
            if not len(model):
                continue
            doomed = list(
                rng.choice(model.k.unique(), size=min(3, model.k.nunique()), replace=False)
            )
            v = table_delete_keys(t, "k", [int(x) for x in doomed])
            model = model[~model.k.isin(doomed)].reset_index(drop=True)

        snapshots[v] = model.copy()
        got = read_table_at(t).to_pandas()
        pd.testing.assert_frame_equal(_norm(got), _norm(model))

        # random retained version must replay its recorded state
        tv = int(rng.choice(list(snapshots.keys())))
        want = snapshots[tv]
        got_tv = read_table_at(t, tv).to_pandas()
        if len(want) == 0:
            assert len(got_tv) == 0
        else:
            pd.testing.assert_frame_equal(_norm(got_tv), _norm(want))


def test_random_ops_with_tags_and_expire(ray_session, tmp_path):
    """Model test extended with random tag / untag / expire: every
    live tag must keep reading exactly its recorded snapshot through
    arbitrary later ops, compactions and retention sweeps."""
    import ray.data as rd

    from textextract_ray.pipelines.tablelog import (
        table_compact,
        table_expire,
        table_restore,
        table_tag,
        table_tags,
        table_untag,
    )

    rng = np.random.RandomState(2027)
    t = str(tmp_path / "tbl")
    table_create(t)
    model = pd.DataFrame({"k": pd.Series([], dtype="int64"), "txt": []})
    snapshots = {0: model.copy()}
    tags: dict = {}

    for step in range(24):
        op = rng.choice(
            ["append", "overwrite", "merge", "delete", "compact", "restore"],
            p=[0.30, 0.15, 0.22, 0.13, 0.10, 0.10],
        )
        if op == "append":
            df = _frame(rng, 200)
            v = table_append(t, rd.from_pandas(df), stats_cols=["k"])
            model = pd.concat([model, df], ignore_index=True)
        elif op == "overwrite":
            df = _frame(rng, 200)
            v = table_overwrite(t, rd.from_pandas(df), stats_cols=["k"])
            model = df.copy()
        elif op == "merge":
            df = _frame(rng, 200)
            v = table_merge(t, rd.from_pandas(df), "k", stats_cols=["k"])
            model = pd.concat(
                [model[~model.k.isin(df.k)], df], ignore_index=True
            )
        elif op == "compact":
            if not len(model):
                continue  # nothing to compact raises by contract
            v = table_compact(t)
        elif op == "restore":
            src = int(rng.choice(list(snapshots.keys())))
            v = table_restore(t, src)
            model = snapshots[src].copy()
        else:  # delete
            if not len(model):
                continue
            doomed = list(
                rng.choice(
                    model.k.unique(), size=min(3, model.k.nunique()), replace=False
                )
            )
            v = table_delete_keys(t, "k", [int(x) for x in doomed])
            model = model[~model.k.isin(doomed)].reset_index(drop=True)
        snapshots[v] = model.copy()

        if rng.rand() < 0.30:
            name = f"t{step}"
            table_tag(t, name, v)
            tags[name] = v
        if tags and rng.rand() < 0.15:
            name = rng.choice(sorted(tags))
            table_untag(t, name)
            del tags[name]
        if rng.rand() < 0.20:
            rep = table_expire(t, keep_last=2, orphan_grace_seconds=0)
            snapshots = {
                kv: s for kv, s in snapshots.items() if kv in rep["kept_versions"]
            }
            assert set(tags.values()) <= set(rep["kept_versions"])

        assert table_tags(t) == tags
        got_head = read_table_at(t).to_pandas()
        if len(model) == 0:
            # a restore to the empty create snapshot round-trips
            # schemaless (documented engine-wide empty caveat)
            assert len(got_head) == 0
        else:
            pd.testing.assert_frame_equal(_norm(got_head), _norm(model))
        for name, tv in tags.items():
            want = snapshots[tv]
            got = read_table_at(t, tag=name).to_pandas()
            if len(want) == 0:
                assert len(got) == 0
            else:
                pd.testing.assert_frame_equal(_norm(got), _norm(want))
