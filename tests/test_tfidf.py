"""TF-IDF top-k keyword extraction: exact DuckDB parity on a planted
corpus (including the vocabulary cutoff and tie-breaks), layout
invariance, and determinism of the vocab boundary."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

M = 3
VOCAB_TOP = 8  # small enough that the cutoff actually bites


def _corpus() -> pd.DataFrame:
    rows = [
        (1, "apple banana apple cherry apple date"),
        (2, "banana cherry banana date elderberry banana"),
        (3, "Cherry cherry CHERRY fig grape apple"),
        (4, "date fig grape himalaya iceberg jackfruit kiwi lemon"),
        (5, "apple banana cherry date elderberry fig grape himalaya"),
        (6, ""),  # empty -> emits nothing
        (7, "zzz-only! punct,separated;tokens zzz-only"),  # punct split
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _oracle(df: pd.DataFrame, m=M, vocab_top=VOCAB_TOP) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", df)
    out = con.execute(
        f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
            FROM docs
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT count(*) AS n FROM docs),
        vocab AS (
            SELECT term, df FROM dfreq
            ORDER BY df DESC, term LIMIT {vocab_top}
        ),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * (ln((1.0 + n.n) / (1.0 + v.df)) + 1.0) AS score
            FROM tf JOIN vocab v USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tf, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term
                   ) AS rank
            FROM scored
        )
        SELECT doc_id, rank, term, tf, round(score, 4) AS score
        FROM ranked WHERE rank <= {m}
        ORDER BY doc_id, rank
        """
    ).df()
    con.close()
    out["rank"] = out["rank"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out.reset_index(drop=True)


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import tfidf_topk_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = tfidf_topk_ds(ds, m=M, vocab_top=VOCAB_TOP, **kw).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def test_tfidf_matches_duckdb(ray_session):
    df = _corpus()
    got = _run(df)
    want = _oracle(df)
    pd.testing.assert_frame_equal(got, want)
    # corpus shape: doc 6 emits nothing; the cutoff dropped rare terms
    assert 6 not in set(got.doc_id)
    all_terms = set(got.term)
    assert len(all_terms) <= VOCAB_TOP


def test_tfidf_layout_invariance(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import tfidf_topk_ds

    df = _corpus()
    want = _oracle(df)
    shuffled = df.sample(frac=1.0, random_state=11).reset_index(drop=True)
    ds = rd.from_arrow(
        pa.Table.from_pandas(shuffled, preserve_index=False)
    ).repartition(4)
    got = tfidf_topk_ds(ds, m=M, vocab_top=VOCAB_TOP).to_pandas()
    got = got.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_tfidf_empty_corpus(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import tfidf_topk_ds

    df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                       "text": pd.Series(dtype="object")})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = tfidf_topk_ds(ds).to_pandas()
    assert len(out) == 0
