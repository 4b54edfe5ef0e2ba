"""Dolma-style attribute store: tagger pass parity, filter-by-predicate
broadcast arm vs co-group arm equivalence, store-is-authoritative
(absent ids drop), schema preservation, layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _docs() -> pd.DataFrame:
    rows = []
    for i in range(30):
        text = ("word " * (i + 1)).strip()
        rows.append((i, text, "en" if i % 3 else "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


TAGGERS = {
    "n_tokens": lambda b: pc.list_value_length(
        pc.split_pattern(pc.fill_null(b["text"], ""), " ")
    ).cast(pa.int32()),
    "is_en": lambda b: pc.equal(b["lang"], "en"),
}


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_tag_attributes_parity(ray_session):
    from textextract_ray.pipelines.attributes import tag_attributes_ds

    df = _docs()
    got = (
        tag_attributes_ds(_ds(df), TAGGERS)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": (df["doc_id"] + 1).astype("int32"),
            "is_en": (df["doc_id"] % 3 != 0),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def _filter(df_docs, df_attrs, predicate, **kw):
    from textextract_ray.pipelines.attributes import filter_by_attributes_ds

    out = filter_by_attributes_ds(_ds(df_docs), _ds(df_attrs), predicate, **kw)
    df = out.to_pandas()
    if len(df) == 0:  # an all-filtered dataset loses its column schema
        return df
    return df.sort_values("doc_id").reset_index(drop=True)


def test_filter_by_attributes_broadcast_arm(ray_session):
    from textextract_ray.pipelines.attributes import tag_attributes_ds

    docs = _docs()
    attrs = tag_attributes_ds(_ds(docs), TAGGERS).to_pandas()
    # drop the store rows for ids 28,29: absent ids must drop
    attrs = attrs[attrs["doc_id"] < 28]
    pred = lambda b: pc.and_(
        pc.greater_equal(b["n_tokens"], 10), b["is_en"]
    )
    got = _filter(docs, attrs, pred)
    want_ids = [
        i for i in range(28) if (i + 1) >= 10 and i % 3 != 0
    ]
    assert list(got["doc_id"]) == want_ids
    assert list(got.columns) == ["doc_id", "text", "lang"]  # schema untouched
    assert (got["text"] == docs.set_index("doc_id").loc[want_ids, "text"].values).all()


def test_filter_by_attributes_cogroup_arm_matches_broadcast(ray_session):
    from textextract_ray.pipelines.attributes import tag_attributes_ds

    docs = _docs()
    attrs = tag_attributes_ds(_ds(docs), TAGGERS).to_pandas()
    pred = lambda b: pc.greater_equal(b["n_tokens"], 7)
    a = _filter(docs, attrs, pred)
    b = _filter(docs, attrs, pred, broadcast_budget_rows=0)  # force co-group
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 24


def test_filter_by_attributes_layout_invariant(ray_session):
    from textextract_ray.pipelines.attributes import tag_attributes_ds

    docs = _docs()
    attrs = tag_attributes_ds(_ds(docs), TAGGERS).to_pandas()
    pred = lambda b: b["is_en"]
    a = _filter(docs, attrs, pred)
    rng = np.random.RandomState(2)
    b = _filter(
        docs.sample(frac=1.0, random_state=1).reset_index(drop=True),
        attrs.sample(frac=1.0, random_state=3).reset_index(drop=True),
        pred,
        broadcast_budget_rows=0,
    )
    pd.testing.assert_frame_equal(a, b)


def test_filter_empty_keep_set(ray_session):
    from textextract_ray.pipelines.attributes import tag_attributes_ds

    docs = _docs()
    attrs = tag_attributes_ds(_ds(docs), TAGGERS).to_pandas()
    got = _filter(docs, attrs, lambda b: pc.greater(b["n_tokens"], 10_000))
    assert len(got) == 0


def test_standard_taggers_e2e_store(ray_session, tmp_path):
    """tag -> write_parquet store -> re-read -> filter: the full Dolma
    tag/mix cycle, with the compression-ratio signal separating
    repetitive boilerplate from prose."""
    import ray.data as rd

    from textextract_ray.pipelines.attributes import (
        filter_by_attributes_ds,
        standard_taggers,
        tag_attributes_ds,
    )

    rows = []
    for i in range(20):
        if i < 5:  # heavily repetitive -> tiny compression ratio
            text = "buy now click here " * 200
        else:
            text = f"Document {i} discusses topic {i * 7} in plain prose. " * 3
        rows.append((i, text))
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    ds = _ds(docs)

    store = str(tmp_path / "attrs")
    tag_attributes_ds(ds, standard_taggers()).write_parquet(store)
    attrs = rd.read_parquet(store)
    adf = attrs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(adf.columns) == [
        "doc_id", "n_chars", "n_tokens", "pred_lang", "compression_ratio",
    ]
    assert (adf.loc[:4, "compression_ratio"] < 0.05).all()
    assert (adf.loc[5:, "compression_ratio"] > 0.2).all()
    assert (adf["n_tokens"] > 0).all()

    kept = filter_by_attributes_ds(
        ds, attrs, lambda b: pc.greater(b["compression_ratio"], 0.1)
    ).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(5, 20))


def test_code_taggers_parity(ray_session):
    from textextract_ray.pipelines.attributes import code_taggers, tag_attributes_ds

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "short\n" + "x" * 500 + "\nmid line here",  # minified-ish blob
                "def f():\n    return 1",
                "",
                None,
            ],
        }
    )
    got = (
        tag_attributes_ds(_ds(docs), code_taggers())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def brute(t):
        t = t or ""
        lines = t.split("\n")
        lens = [len(ln) for ln in lines]
        total = max(len(t), 1)
        return (
            max(lens),
            sum(lens) / len(lens),
            sum(c.isascii() and c.isalnum() for c in t) / total,
            sum(c.isascii() and c.isalpha() for c in t) / total,
        )

    for i, r in got.iterrows():
        mx, mn, an, al = brute(docs["text"][i])
        assert r["max_line_len"] == mx
        assert abs(r["mean_line_len"] - mn) < 1e-12
        assert abs(r["alnum_frac"] - an) < 1e-12
        assert abs(r["alpha_frac"] - al) < 1e-12
    assert got.loc[0, "max_line_len"] == 500
