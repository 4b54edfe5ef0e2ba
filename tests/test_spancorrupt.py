"""T5/UL2 span corruption: reconstruction invariant, exact-count
geometry, sentinel discipline, determinism, layout invariance, edges."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from textextract_ray.pipelines.textops import span_corrupt_ds

_SENT_RE = re.compile(r"<extra_id_(\d+)>")


def _corpus(n=40, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        k = rng.randint(1, 60)
        rows.append((i, " ".join(f"w{i}t{j}" for j in range(k))))
    rows.append((n, "short one"))          # under min_tokens -> bypass
    rows.append((n + 1, ""))               # empty -> bypass
    rows.append((n + 2, None))             # null -> bypass
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _reconstruct(inputs: str, targets: str) -> str:
    """Splice targets' spans back over inputs' sentinels."""
    spans = {}
    parts = _SENT_RE.split(targets)
    # parts = [prefix(empty), k0, span0, k1, span1, ..., k_last, tail]
    for j in range(1, len(parts) - 1, 2):
        spans[int(parts[j])] = parts[j + 1].strip()
    # interleave: split inputs keeping sentinel ids
    toks = []
    pos = 0
    for m in _SENT_RE.finditer(inputs):
        toks.extend(inputs[pos : m.start()].split())
        toks.extend(spans[int(m.group(1))].split())
        pos = m.end()
    toks.extend(inputs[pos:].split())
    return " ".join(toks)


def test_reconstruction_and_geometry(ray_session):
    table = _corpus()
    got = (
        span_corrupt_ds(rd.from_arrow(table), rate=0.15, mean_span=3, min_tokens=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig = {i: (t or "") for i, t in zip(table["doc_id"].to_pylist(), table["text"].to_pylist())}
    assert len(got) == table.num_rows
    for _, row in got.iterrows():
        norm = " ".join(orig[row["doc_id"]].split())
        n = len(norm.split())
        if not row["corrupted"]:
            assert row["targets"] == "" and row["n_spans"] == 0
            continue
        # reconstruction: inputs + targets == whitespace-normalized original
        assert _reconstruct(row["inputs"], row["targets"]) == norm
        # exact corrupted-token count
        n_corrupt = int(np.clip(round(0.15 * n), 1, n))
        dropped = sum(
            len(s.strip().split())
            for s in _SENT_RE.split(row["targets"])[2::2]
        )
        assert dropped == n_corrupt
        # sentinels: inputs carry 0..n_spans-1 in order, targets end
        # with <extra_id_{n_spans}>
        in_ids = [int(m) for m in _SENT_RE.findall(row["inputs"])]
        tg_ids = [int(m) for m in _SENT_RE.findall(row["targets"])]
        ns = int(row["n_spans"])
        assert in_ids == list(range(ns))
        assert tg_ids == list(range(ns + 1))
        assert row["targets"].endswith(f"<extra_id_{ns}>")


def test_determinism_layout_and_seed(ray_session):
    table = _corpus()
    a = span_corrupt_ds(rd.from_arrow(table)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = span_corrupt_ds(rd.from_arrow(table)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # layout invariance: one row per block
    shards = rd.from_arrow([table.slice(i, 1) for i in range(table.num_rows)])
    c = span_corrupt_ds(shards).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c)
    # a different seed moves at least one span layout
    d = span_corrupt_ds(rd.from_arrow(table), seed=99).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not a["inputs"].equals(d["inputs"])


def test_sentinel_clamp_and_contracts(ray_session):
    # tiny mean_span + high rate on a long doc would want many spans;
    # max_sentinels clamps and the final sentinel id never exceeds it
    table = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([" ".join(f"t{j}" for j in range(400))], pa.string()),
        }
    )
    got = span_corrupt_ds(
        rd.from_arrow(table), rate=0.5, mean_span=1, max_sentinels=8
    ).to_pandas()
    ns = int(got["n_spans"].iloc[0])
    assert ns <= 7
    assert got["targets"].iloc[0].endswith(f"<extra_id_{ns}>")
    assert _reconstruct(got["inputs"].iloc[0], got["targets"].iloc[0]) == " ".join(
        f"t{j}" for j in range(400)
    )

    with pytest.raises(ValueError):
        span_corrupt_ds(rd.from_arrow(table), rate=0.0)
    with pytest.raises(ValueError):
        span_corrupt_ds(rd.from_arrow(table), mean_span=0)
