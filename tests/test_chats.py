"""Chat/SFT assembly: span round-trip (text[start:end] == content),
trainable masking, turn ordering, duplicate-turn contract, layout
invariance, empty-content turns."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.pipelines.chats import assemble_chat_ds, render_conversation


def _ds(df, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts else ds


def _turns():
    rows = []
    for c in range(6):
        n = 2 + c % 3 * 2
        for t in range(n):
            role = "user" if t % 2 == 0 else "assistant"
            rows.append((c, t, role, f"conv{c} turn{t} says {'x' * (t + 1)}"))
    # shuffle row order to prove turn_idx governs, not input order
    rng = np.random.RandomState(4)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "content"])
    return df


def test_render_kernel_spans_exact():
    text, spans = render_conversation(
        ["user", "assistant", "user"], ["hi", "hello there", ""]
    )
    assert [text[s:e] for s, e, _ in spans] == ["hi", "hello there", ""]
    assert text.startswith("<|im_start|>user\nhi<|im_end|>\n")
    assert text.count("<|im_start|>") == 3


def test_assemble_spans_round_trip(ray_session):
    df = _turns()
    out = assemble_chat_ds(_ds(df, 5)).to_pandas().sort_values("conv_id")
    assert len(out) == 6
    content_of = df.set_index(["conv_id", "turn_idx"])["content"]
    for _, row in out.iterrows():
        spans = row["spans"]
        assert row["n_turns"] == len(spans)
        train_chars = 0
        for t, sp in enumerate(spans):
            want = content_of.loc[(row["conv_id"], t)]
            assert row["text"][sp["start"]:sp["end"]] == want
            assert sp["trainable"] == (sp["role"] == "assistant")
            if sp["trainable"]:
                train_chars += sp["end"] - sp["start"]
        assert row["n_trainable_chars"] == train_chars
        # spans ordered and non-overlapping
        ends = [-1] + [sp["end"] for sp in spans]
        assert all(sp["start"] >= e for sp, e in zip(spans, ends))


def test_assemble_layout_invariance_and_contract(ray_session):
    df = _turns()
    a = assemble_chat_ds(_ds(df, 2)).to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = assemble_chat_ds(_ds(df, 13)).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    dup = pd.concat([df, df.iloc[[0]]], ignore_index=True)
    with pytest.raises(Exception, match="duplicate turn_idx"):
        assemble_chat_ds(_ds(dup)).to_pandas()


def test_assemble_null_content_and_roles(ray_session):
    df = pd.DataFrame(
        {
            "conv_id": [0, 0, 0],
            "turn_idx": [0, 1, 2],
            "role": ["system", "user", "assistant"],
            "content": ["be brief", None, "ok"],
        }
    )
    out = assemble_chat_ds(_ds(df), trainable_roles=("assistant", "system"))
    row = out.to_pandas().iloc[0]
    spans = row["spans"]
    assert row["text"][spans[1]["start"]:spans[1]["end"]] == ""  # null -> ""
    assert [sp["trainable"] for sp in spans] == [True, False, True]
    assert row["n_trainable_chars"] == len("be brief") + len("ok")
