"""SFT / instruction-data assembly: turns → rendered conversations
with exact loss-mask spans.

The last mile of an instruction-tuning data pipeline: a table of
(conversation, turn index, role, content) rows becomes one row per
conversation holding the RENDERED training text plus a span table
(character start/end of each turn's content, its role, and whether it
is trainable) — the structure a loss-masking tokenizer consumes
(train on assistant turns only, the standard SFT recipe). The
template is a fixed ChatML-shaped frame::

    <|im_start|>{role}\n{content}<|im_end|>\n

versioned by ``CHAT_TEMPLATE_VERSION`` — change the frame, bump the
version (rendered corpora are persisted artifacts, same rule as the
extractor version).

Span contract (pinned in pytest): ``text[start:end] == content`` for
every turn, byte-for-byte; spans are non-overlapping and ordered by
``turn_idx``. Because spans point at CONTENT (not the frame), a
tokenizer can mask precisely even if it splits the frame tokens
differently.

Scale shape: conversations are small (tens of turns); the one shuffle
is the stable-hash bucket co-location of each conversation's rows
(`_bucketed_apply` economics — O(num_buckets) dispatch, rows ship
once); assembly inside a bucket is a pandas groupby with one
string-join per conversation, the irreducible per-conversation unit.
Deterministic and layout-independent: output is a pure function of
the (conv_id, turn_idx)-sorted rows, and duplicate turn indexes raise
rather than rendering an order-dependent text.

Reference parity: none (no conversational data in the reference);
training-data-pipeline brief operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CHAT_TEMPLATE_VERSION = "chatml-1"
_PRE = "<|im_start|>"
_MID = "\n"
_POST = "<|im_end|>\n"


def render_conversation(roles: list, contents: list) -> tuple:
    """(text, spans) for one conversation — the pure kernel, shared by
    the distributed assembler and any driver-side caller. Spans are
    (start, end, role) with start/end in CHARACTERS over the rendered
    text, covering exactly the content."""
    parts = []
    spans = []
    pos = 0
    for role, content in zip(roles, contents):
        head = f"{_PRE}{role}{_MID}"
        parts.append(head)
        pos += len(head)
        c = content if content is not None else ""
        parts.append(c)
        spans.append((pos, pos + len(c), role))
        pos += len(c)
        parts.append(_POST)
        pos += len(_POST)
    return "".join(parts), spans


def assemble_chat_ds(
    turns,
    *,
    conv_id_col: str = "conv_id",
    turn_idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    trainable_roles: tuple = ("assistant",),
    num_buckets: int = 64,
):
    """Dataset of (conv_id, text, n_turns, n_trainable_chars, spans)
    — spans is ``list<struct<start, end, role, trainable>>``. See
    module docstring for the template and contracts."""
    from ..functions.scalar import stable_bucket

    trainset = frozenset(trainable_roles)
    span_type = pa.list_(
        pa.struct(
            [
                ("start", pa.int64()),
                ("end", pa.int64()),
                ("role", pa.string()),
                ("trainable", pa.bool_()),
            ]
        )
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket",
            pa.array(stable_bucket(batch[conv_id_col], num_buckets), pa.int32()),
        )

    def assemble(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([conv_id_col, turn_idx_col], kind="mergesort")
        if df.duplicated([conv_id_col, turn_idx_col]).any():
            bad = df[df.duplicated([conv_id_col, turn_idx_col])].iloc[0]
            raise ValueError(
                f"assemble_chat_ds: duplicate turn_idx {bad[turn_idx_col]!r} "
                f"in conversation {bad[conv_id_col]!r} — (conv_id, turn_idx) "
                "must be unique (the render would be order-dependent)"
            )
        conv_ids, texts, n_turns, n_train, span_lists = [], [], [], [], []
        for cid, g in df.groupby(conv_id_col, sort=True):
            roles = g[role_col].tolist()
            text, spans = render_conversation(roles, g[content_col].tolist())
            rich = [
                {
                    "start": s,
                    "end": e,
                    "role": r,
                    "trainable": r in trainset,
                }
                for s, e, r in spans
            ]
            conv_ids.append(cid)
            texts.append(text)
            n_turns.append(len(roles))
            n_train.append(
                sum(sp["end"] - sp["start"] for sp in rich if sp["trainable"])
            )
            span_lists.append(rich)
        return pa.table(
            {
                conv_id_col: pa.array(conv_ids),
                "text": pa.array(texts, pa.string()),
                "n_turns": pa.array(n_turns, pa.int64()),
                "n_trainable_chars": pa.array(n_train, pa.int64()),
                "spans": pa.array(span_lists, span_type),
            }
        )

    def apply(df: pd.DataFrame) -> pa.Table:
        return assemble(df.drop(columns=["_bucket"]))

    return (
        turns.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(apply, batch_format="pandas")
    )


def chat_token_examples_ds(
    chats,
    merges,
    *,
    conv_id_col: str = "conv_id",
    text_col: str = "text",
    spans_col: str = "spans",
):
    """Model-ready SFT examples: rendered chats → BPE token ids + a
    token-level loss mask. Composes the corpus-trained tokenizer
    (functions/bpe, word regime ``[a-z]+`` — frame markup and
    punctuation carry no ids, exactly the regime the engine's other
    BPE surfaces use) with the span table ``assemble_chat_ds`` emits:
    a word's tokens are trainable iff the word lies ENTIRELY inside a
    trainable span (a straddling word — impossible under the ChatML
    frame, which brackets content with non-letters — would be masked
    off, the safe direction).

    Scale shape: merge ranks + vocab broadcast ONCE via ``ray.put``;
    one streaming pass, per-batch word-level memo cache (web text
    repeats words heavily), ZERO shuffle. Returns (conv_id, token_ids
    list<int32>, loss_mask list<bool>, n_tokens, n_trainable_tokens).
    """
    import re

    import ray

    from ..functions.bpe import bpe_encode_ids, bpe_vocab, merge_ranks

    rref = ray.put((merge_ranks(merges), bpe_vocab(merges)))
    word_re = re.compile(r"[a-zA-Z]+")

    def encode(batch: pa.Table) -> pa.Table:
        ranks, vocab = ray.get(rref)
        texts = batch[text_col].to_pylist()
        span_lists = batch[spans_col].to_pylist()
        out_ids, out_mask, n_tok, n_train = [], [], [], []
        for text, spans in zip(texts, span_lists):
            train_spans = sorted(
                (sp["start"], sp["end"]) for sp in spans if sp["trainable"]
            )
            starts = np.array([s for s, _ in train_spans], dtype=np.int64)
            ends = np.array([e for _, e in train_spans], dtype=np.int64)
            words, wpos = [], []
            for m in word_re.finditer(text):
                words.append(m.group().lower())
                wpos.append((m.start(), m.end()))
            ids_per_word = bpe_encode_ids(words, ranks, vocab)
            ids, mask = [], []
            for (ws, we), wids in zip(wpos, ids_per_word):
                j = int(np.searchsorted(starts, ws, side="right")) - 1
                trainable = bool(j >= 0 and we <= ends[j])
                ids.extend(wids)
                mask.extend([trainable] * len(wids))
            out_ids.append(ids)
            out_mask.append(mask)
            n_tok.append(len(ids))
            n_train.append(int(sum(mask)))
        return pa.table(
            {
                conv_id_col: batch[conv_id_col],
                "token_ids": pa.array(out_ids, pa.list_(pa.int32())),
                "loss_mask": pa.array(out_mask, pa.list_(pa.bool_())),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_trainable_tokens": pa.array(n_train, pa.int64()),
            }
        )

    return chats.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
