"""End-to-end pretraining-prep recipe: stage chaining, per-stage
persisted parquet with resume markers, monotone survivor counts, and
determinism of the final packed table across a full rerun."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa


def test_pretraining_prep_end_to_end(ray_session, sf_dir, tmp_path):
    import ray

    from textextract_ray.pipelines.textops import (
        PREP_STAGES,
        pretraining_prep,
    )

    out = str(tmp_path / "prep")
    rep = pretraining_prep(sf_dir, out, min_quality=0.2, k=20, capacity=128)
    assert list(rep["stage"]) == ["input"] + list(PREP_STAGES)

    counts = dict(zip(rep["stage"], rep["rows"]))
    # filters and dedup can only shrink the doc set
    assert counts["quality"] <= counts["input"]
    assert counts["paradedup"] <= counts["quality"]
    assert counts["substrdedup"] <= counts["paradedup"]
    # order and pack are 1:1 with the survivor set
    assert counts["order"] == counts["substrdedup"]
    assert counts["pack"] == counts["substrdedup"]
    assert counts["substrdedup"] > 0  # non-vacuous at sf0.001

    # every stage persisted with a done marker (the resume contract)
    for name in PREP_STAGES:
        assert os.path.exists(os.path.join(out, name, "_DONE"))

    # packed table is a valid prefix-sum packing: global_start strictly
    # increasing in doc order, offsets within capacity
    packed = ray.data.read_parquet(os.path.join(out, "pack")).to_pandas()
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    gs = packed["global_start"].to_numpy()
    nt = packed["n_tokens"].to_numpy()
    assert (gs[1:] == gs[:-1] + nt[:-1]).all()
    assert (packed["seq_offset"] < 128).all()

    # resume: rerun is a no-op (markers honored) and returns the same report
    rep2 = pretraining_prep(sf_dir, out, min_quality=0.2, k=20, capacity=128)
    pd.testing.assert_frame_equal(rep, rep2)


def test_pretraining_prep_stage_resume(ray_session, sf_dir, tmp_path):
    """Deleting one stage dir forces recomputation of exactly that
    stage (and its dependents read the persisted upstream), and the
    recomputed output is identical — the kill/resume determinism pin."""
    import shutil

    import ray

    from textextract_ray.pipelines.textops import pretraining_prep

    out = str(tmp_path / "prep")
    pretraining_prep(sf_dir, out, min_quality=0.2, k=20, capacity=128)
    before = (
        ray.data.read_parquet(os.path.join(out, "pack"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    shutil.rmtree(os.path.join(out, "pack"))
    pretraining_prep(sf_dir, out, min_quality=0.2, k=20, capacity=128)
    after = (
        ray.data.read_parquet(os.path.join(out, "pack"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)


def test_pretraining_prep_clean_stage(ray_session, sf_dir, tmp_path):
    """clean=True prepends the normalize+linefreq stage: the report
    carries a 'clean' row, the stage dir persists with a marker, and
    downstream stages consume the cleaned survivors."""
    import os

    from textextract_ray.pipelines.textops import pretraining_prep

    out = str(tmp_path / "prep_clean")
    rep = pretraining_prep(sf_dir, out, clean=True, min_quality=0.0)
    assert list(rep["stage"])[:2] == ["input", "clean"]
    assert os.path.exists(os.path.join(out, "clean", "_DONE"))
    counts = dict(zip(rep["stage"], rep["rows"]))
    assert 0 < counts["clean"] <= counts["input"]
    assert counts["quality"] <= counts["clean"]
