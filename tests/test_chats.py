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


def test_chat_token_examples_end_to_end(ray_session):
    from textextract_ray.functions.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        merge_ranks,
        train_bpe,
    )
    from textextract_ray.pipelines.chats import chat_token_examples_ds

    df = _turns()
    merges = train_bpe(
        {w: 5 for row in df["content"] for w in row.split()}, n_merges=50
    )
    chats = assemble_chat_ds(_ds(df, 3))
    out = (
        chat_token_examples_ds(chats, merges)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    ranks, vocab = merge_ranks(merges), bpe_vocab(merges)
    chat_rows = chats.to_pandas().set_index("conv_id")
    import re

    for _, row in out.iterrows():
        text = chat_rows.loc[row["conv_id"], "text"]
        spans = chat_rows.loc[row["conv_id"], "spans"]
        words = [m.group().lower() for m in re.finditer(r"[a-zA-Z]+", text)]
        want_ids = [i for ids in bpe_encode_ids(words, ranks, vocab) for i in ids]
        assert list(row["token_ids"]) == want_ids  # ids match a direct encode
        assert row["n_tokens"] == len(want_ids)
        assert len(row["loss_mask"]) == len(want_ids)
        # trainable tokens exist iff there are assistant turns, and the
        # frame words (im_start / roles) are never trainable
        has_assistant = any(sp["trainable"] for sp in spans)
        assert (row["n_trainable_tokens"] > 0) == has_assistant
        assert row["n_trainable_tokens"] < row["n_tokens"]


def test_chat_token_mask_precision(ray_session):
    from textextract_ray.functions.bpe import train_bpe
    from textextract_ray.pipelines.chats import chat_token_examples_ds

    df = pd.DataFrame(
        {
            "conv_id": [0, 0],
            "turn_idx": [0, 1],
            "role": ["user", "assistant"],
            "content": ["aaaa bbbb", "cccc dddd cccc"],
        }
    )
    merges = train_bpe({"aaaa": 5, "bbbb": 5, "cccc": 5, "dddd": 5}, n_merges=20)
    chats = assemble_chat_ds(_ds(df))
    row = chat_token_examples_ds(chats, merges).to_pandas().iloc[0]
    ids = np.array(row["token_ids"])
    mask = np.array(row["loss_mask"])
    # exactly the assistant words' tokens are trainable: with 20 merges
    # each 4-char word encodes to ONE token, so 3 trainable tokens
    assert mask.sum() == 3
    # trainable ids are the cccc/dddd merge outputs, all distinct from
    # the user-turn ids
    assert set(ids[mask]) .isdisjoint({i for i, m in zip(ids, mask) if not m} - set(ids[mask]))


def test_chat_spans_survive_parquet(ray_session, tmp_path):
    # nested list<struct> spans must round-trip through the parquet
    # sink/read path a real pipeline uses between assembly and
    # tokenization
    import ray.data as rd

    df = _turns()
    chats = assemble_chat_ds(_ds(df, 3))
    d = str(tmp_path / "chats")
    chats.write_parquet(d)
    back = rd.read_parquet(d).to_pandas().sort_values("conv_id").reset_index(drop=True)
    orig = chats.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert back["text"].tolist() == orig["text"].tolist()
    for a, b in zip(back["spans"], orig["spans"]):
        assert [dict(x) for x in a] == [dict(x) for x in b]
