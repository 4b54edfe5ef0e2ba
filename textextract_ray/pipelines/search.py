"""Distributed inverted index + BM25 ranked retrieval over the corpus.

Boolean/ranked text search is the retrieval counterpart of the ANN
stack (`stages/similarity.py`): build once, query many times, never
rescan the corpus per query. Public algorithm: BM25 per Robertson &
Spärck Jones / the Lucene practical variant
idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score = Σ_t idf_t · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).

Index layout (built by ``build_text_index``):
  ``<dir>/postings``  — rows (term, doc_id, tf, dl), range-CLUSTERED by
      term via `storage.write_clustered`, so a q-term query opens at
      most q range directories out of the whole index;
  ``<dir>/df``        — rows (term, df), clustered the same way;
  ``<dir>/meta.json`` — N docs, avgdl, analyzer id (tmp+rename commit).

Scale shape: postings build is ONE tokenize pass emitting per-batch
pre-deduped (term, doc_id, tf, dl) rows (dl is denormalized onto each
posting so query-time scoring never joins the O(corpus) doc-length
table); df is one keys-only (term, 1) groupby over the SAME pass's
partials. No corpus text ever rides a shuffle — the clustered postings
write is shuffle-free range tagging. Query time touches O(q) range
dirs + a vocab-scale df lookup, then scores per posting row and
aggregates per doc: everything downstream of the pruned read is
O(matching postings), independent of corpus size.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from .storage import read_clustered_keys, write_clustered
from .textops import _lower_token_lists

ANALYZER = "lower-nonalpha-split-v1"  # pinned: index and query must agree


def _analyze_batch(col):
    """The one analyzer both sides share: lowercase, split on
    non-[a-z], drop empties. Returns (flat terms, parent indices)."""
    lists = _lower_token_lists(col)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), parent[keep]


def analyze_query(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z]+", (text or "").lower()) if t]


def build_text_index(
    docs,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int = 64,
) -> dict:
    """Build the clustered BM25 index under ``index_dir``. Returns the
    committed meta dict (n_docs, avgdl, analyzer)."""

    def postings(batch: pa.Table) -> pa.Table:
        flat, parent = _analyze_batch(batch[text_col])
        n_rows = batch.num_rows
        dl = np.bincount(parent, minlength=n_rows).astype(np.int32)
        if not len(flat):
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    id_col: batch[id_col].slice(0, 0).cast(pa.int64()),
                    "tf": pa.array([], pa.int32()),
                    "dl": pa.array([], pa.int32()),
                }
            )
        # per-(doc, term) tf without a Python loop: factorize terms to
        # codes, pack (parent, code) into one int64, np.unique counts
        codes = pc.dictionary_encode(flat)
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = codes.dictionary
        key = (parent.astype(np.int64) << np.int64(32)) | idx
        uniq, tf = np.unique(key, return_counts=True)
        u_parent = (uniq >> np.int64(32)).astype(np.int64)
        u_code = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
        ids = batch[id_col].cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "term": pc.take(vocab, pa.array(u_code)),
                id_col: ids.take(pa.array(u_parent)),
                "tf": pa.array(tf.astype(np.int32)),
                "dl": pa.array(dl[u_parent]),
            }
        )

    post = docs.map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed 3×: df, stats, clustered write

    # document frequency: keys-only (term, 1-per-doc) groupby — postings
    # are already unique per (doc, term), so df = row count per term
    def df_partials(batch: pa.Table) -> pa.Table:
        vc = batch["term"].combine_chunks().value_counts()
        return pa.table(
            {"term": vc.field("values"), "df": vc.field("counts").cast(pa.int64())}
        )

    dfs = (
        post.map_batches(df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )

    n_docs = docs.count()
    total_tokens = post.sum("tf") or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    write_clustered(post, os.path.join(index_dir, "postings"), "term",
                    num_ranges=num_ranges)
    write_clustered(dfs, os.path.join(index_dir, "df"), "term",
                    num_ranges=num_ranges)
    meta = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "analyzer": ANALYZER,
        "id_col": id_col,
    }
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def bm25_search(
    index_dir: str,
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Rank the top-``k`` documents for ``query`` against a
    ``build_text_index`` layout. Opens only the term-covering range
    directories of postings and df (``read_clustered_keys``); repeated
    query terms count once (bag-of-terms OR query, the BM25 default).
    Returns (doc_id, score) sorted by (score desc, doc_id asc) —
    deterministic ties."""
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    id_col = meta["id_col"]
    terms = sorted(set(analyze_query(query)))
    if not terms:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    df_tbl = read_clustered_keys(os.path.join(index_dir, "df"), terms).to_pandas()
    if not len(df_tbl):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    n_docs, avgdl = meta["n_docs"], max(meta["avgdl"], 1e-9)
    dfv = df_tbl.set_index("term")["df"].astype(np.float64)
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    idf_terms = pa.array(idf.index.tolist(), pa.string())
    idf_vals = idf.to_numpy()

    post = read_clustered_keys(os.path.join(index_dir, "postings"), terms)

    def score(batch: pa.Table) -> pa.Table:
        t_idx = pc.index_in(batch["term"], value_set=idf_terms)
        w = idf_vals[t_idx.to_numpy(zero_copy_only=False)]
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: batch[id_col], "partial": pa.array(s)})

    scored = (
        post.map_batches(score, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("partial", alias_name="score"))
        .to_pandas()  # O(matching docs), bounded by the q-term postings
    )
    scored = scored.sort_values(
        ["score", id_col], ascending=[False, True]
    ).head(k)
    return scored.reset_index(drop=True)
