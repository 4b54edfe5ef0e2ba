"""Dedup ladder tests: exact, MinHash-LSH, SimHash, embedding."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def doc_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact dup of 0
        {"doc_id": 2, "text": base + " extra"},  # near dup of 0
        {"doc_id": 3, "text": "completely different text about databases and airplanes"},
        {"doc_id": 4, "text": base},  # exact dup of 0
        {"doc_id": 5, "text": "another unrelated document mentioning space travel topics"},
    ]
    return rd.from_items(rows)


def test_exact_dedup_keeps_min_id(doc_ds):
    from textextract_ray.stages.dedup import exact_dedup

    out = exact_dedup(doc_ds, "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 5]


def test_minhash_finds_near_dups(doc_ds):
    from textextract_ray.stages.dedup import minhash_duplicate_assignments

    pairs = minhash_duplicate_assignments(
        doc_ds, "text", "doc_id", threshold=0.5
    ).to_pandas()
    assignments = dict(zip(pairs["id"], pairs["keep_id"]))
    assert assignments[1] == 0
    assert assignments[4] == 0
    assert assignments.get(2) == 0  # near dup caught
    assert 3 not in assignments
    assert 5 not in assignments


def test_minhash_dedup_filters(doc_ds):
    from textextract_ray.stages.dedup import minhash_dedup

    out = minhash_dedup(doc_ds, "text", "doc_id", threshold=0.5).to_pandas()
    assert set(out["doc_id"]) == {0, 3, 5}


def test_minhash_dedup_string_ids(ray_session):
    # id columns keep their native type end-to-end — string ids (e.g.
    # urls) must not be force-cast to int64 anywhere in the ladder
    import ray.data as rd

    from textextract_ray.stages.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        {"url": "a://0", "text": base},
        {"url": "b://1", "text": base},
        {"url": "c://2", "text": "totally unrelated text about marine biology research"},
    ]
    out = minhash_dedup(rd.from_items(rows), "text", "url", threshold=0.5).to_pandas()
    assert set(out["url"]) == {"a://0", "c://2"}


def test_minhash_dedup_no_dups_passthrough(ray_session):
    # empty drop set: the filter stage is skipped entirely (no is_in
    # against an empty value_set of a mismatched type)
    import ray.data as rd

    from textextract_ray.stages.dedup import minhash_dedup

    rows = [
        {"url": "a://0", "text": "first entirely distinct document body here"},
        {"url": "b://1", "text": "second unrelated text about marine biology"},
    ]
    out = minhash_dedup(rd.from_items(rows), "text", "url", threshold=0.5).to_pandas()
    assert set(out["url"]) == {"a://0", "b://1"}


def test_simhash_assignments(doc_ds):
    from textextract_ray.stages.dedup import simhash_duplicate_assignments

    pairs = simhash_duplicate_assignments(
        doc_ds, "text", "doc_id", max_hamming=3
    ).to_pandas()
    assignments = dict(zip(pairs["id"], pairs["keep_id"]))
    assert assignments[1] == 0 and assignments[4] == 0
    assert 3 not in assignments and 5 not in assignments


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    base = rng.randn(8).astype(np.float32)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base * 2.0).tolist()},  # same direction
        {"vec_id": 2, "embedding": (base + rng.randn(8).astype(np.float32) * 0.01).tolist()},
        {"vec_id": 3, "embedding": rng.randn(8).astype(np.float32).tolist()},
    ]
    from textextract_ray.stages.dedup import embedding_duplicate_assignments

    pairs = embedding_duplicate_assignments(
        rd.from_items(rows), "embedding", "vec_id", threshold=0.99
    ).to_pandas()
    assignments = dict(zip(pairs["id"], pairs["keep_id"]))
    assert assignments.get(1) == 0
    assert assignments.get(2) == 0
    assert 3 not in assignments


def test_semantic_dedup_finds_planted_dups(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    rows = [
        {"vec_id": i, "embedding": rng.randn(8).astype(np.float32).tolist()}
        for i in range(40)
    ]
    base3 = np.array(rows[3]["embedding"], dtype=np.float32)
    base17 = np.array(rows[17]["embedding"], dtype=np.float32)
    # planted near-dups: same direction (scaled) and tiny perturbation
    rows.append({"vec_id": 100, "embedding": (base3 * 1.7).tolist()})
    rows.append(
        {"vec_id": 101, "embedding": (base17 + 0.01 * rng.randn(8).astype(np.float32)).tolist()}
    )
    from textextract_ray.stages.dedup import semantic_duplicate_assignments

    pairs = semantic_duplicate_assignments(
        rd.from_items(rows), "embedding", "vec_id", threshold=0.97, n_centroids=4
    ).to_pandas()
    assignments = dict(zip(pairs["id"], pairs["keep_id"]))
    assert assignments.get(100) == 3
    assert assignments.get(101) == 17


def test_ngram_jaccard_pairs(doc_ds):
    from textextract_ray.stages.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(doc_ds, "text", "doc_id", threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got and (0, 4) in got and (1, 4) in got
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert exact["jaccard"].iloc[0] == 1.0


def test_dedup_is_partitioning_invariant(doc_ds):
    from textextract_ray.stages.dedup import minhash_duplicate_assignments

    a = minhash_duplicate_assignments(doc_ds, "text", "doc_id", threshold=0.5).to_pandas()
    b = minhash_duplicate_assignments(
        doc_ds.repartition(5), "text", "doc_id", threshold=0.5
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True),
    )


def test_resolve_clusters_union_find_and_distributed(ray_session):
    """Connected components over pair tables: driver union-find and the
    distributed hash-to-min path agree with each other, with a
    constructed ground truth (chains = worst diameter, stars, merged
    components), and with a DuckDB recursive-CTE oracle on a random
    graph."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from textextract_ray.stages.dedup import resolve_clusters

    # constructed graph: chain 0-1-2-3-4, star 10-{11,12,13},
    # two-edge merge 20-21, 21-22, singleton pair 30-31
    edges = [(0, 1), (1, 2), (2, 3), (3, 4),
             (10, 11), (10, 12), (10, 13),
             (20, 21), (21, 22), (30, 31)]
    truth = {}
    for comp in ([0, 1, 2, 3, 4], [10, 11, 12, 13], [20, 21, 22], [30, 31]):
        for x in comp:
            truth[x] = comp[0]
    pairs = pd.DataFrame(
        {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}
    )

    drv = resolve_clusters(rd.from_pandas(pairs)).to_pandas()
    assert dict(zip(drv["id"], drv["rep"])) == truth

    dist = (
        resolve_clusters(rd.from_pandas(pairs), driver_budget_rows=0)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert dict(zip(dist["id"], dist["rep"])) == truth

    # random graph vs DuckDB recursive-CTE transitive closure
    rng = np.random.default_rng(42)
    ra = rng.integers(0, 120, 150)
    rb = rng.integers(0, 120, 150)
    rp = pd.DataFrame({"id_a": ra, "id_b": rb})
    got = (
        resolve_clusters(rd.from_pandas(rp))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pairs", rp)
    want = con.execute(
        """
        WITH RECURSIVE sym AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
            UNION SELECT id_a, id_a FROM pairs
            UNION SELECT id_b, id_b FROM pairs
        ), reach(u, v) AS (
            SELECT u, v FROM sym
            UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        )
        SELECT u AS id, min(v) AS rep FROM reach GROUP BY u ORDER BY u
        """
    ).df()
    assert got["id"].tolist() == want["id"].tolist()
    assert got["rep"].tolist() == want["rep"].tolist()

    # distributed path agrees on the random graph too
    got_dist = (
        resolve_clusters(rd.from_pandas(rp), driver_budget_rows=0)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got_dist["rep"].tolist() == want["rep"].tolist()

    # empty pair table
    empty = resolve_clusters(
        rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": []}))
    ).to_pandas()
    assert len(empty) == 0


def test_drop_cluster_duplicates(ray_session):
    """Composed near-dup dedup: minhash pairs -> transitive clusters ->
    keep exactly one row per cluster (the min id), everything else
    streams through untouched."""
    import pandas as pd
    import ray.data as rd

    from textextract_ray.stages.dedup import (
        drop_cluster_duplicates,
        resolve_clusters,
    )

    docs = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": ["alpha"] * 1 + ["x%d" % i for i in range(7)],
        }
    )
    # chain 0~1, 1~2 (transitive: {0,1,2} is ONE cluster even though
    # 0 and 2 never pair directly), plus 5~6
    pairs = pd.DataFrame({"id_a": [0, 1, 5], "id_b": [1, 2, 6]})
    clusters = resolve_clusters(rd.from_pandas(pairs))
    kept = (
        drop_cluster_duplicates(rd.from_pandas(docs), clusters, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert kept["doc_id"].tolist() == [0, 3, 4, 5, 7]


def test_winnow_fingerprint_guarantee():
    """Winnowing guarantee: shared token runs >= w + k - 1 produce a
    shared fingerprint; disjoint random texts share none; layout of
    surrounding text doesn't matter."""
    import numpy as np

    from textextract_ray.functions.text import winnow_fingerprints

    shared = " ".join(f"tok{i}" for i in range(30))
    a = "aaa bbb " + shared + " ccc"
    b = "xxx " + shared + " yyy zzz qqq"
    c = " ".join(f"zz{i}" for i in range(60))
    fa, fb, fc = winnow_fingerprints([a, b, c], k=4, w=8)
    assert len(np.intersect1d(fa, fb)) >= 1
    assert len(np.intersect1d(fa, fc)) == 0
    assert len(np.intersect1d(fb, fc)) == 0
    # deterministic and batch-layout independent
    fa2 = winnow_fingerprints([a], k=4, w=8)[0]
    assert np.array_equal(fa, fa2)
    # empty doc -> empty set
    assert len(winnow_fingerprints([""], k=4, w=8)[0]) == 0


def test_winnow_overlap_pairs(ray_session):
    """Substring-overlap operator: planted quoted paragraphs are found
    across block layouts, Jaccard-invisible partial copies included;
    unrelated docs produce no pairs."""
    import pandas as pd
    import ray.data as rd

    from textextract_ray.stages.dedup import winnow_overlap_pairs

    quote = " ".join(f"quote{i}" for i in range(40))
    rng_texts = {
        i: " ".join(f"doc{i}w{j}" for j in range(120)) for i in range(10)
    }
    docs = []
    for i in range(10):
        t = rng_texts[i]
        if i in (2, 7):  # two docs quote the same paragraph
            t = t[: len(t) // 2] + " " + quote + " " + t[len(t) // 2 :]
        docs.append({"doc_id": i, "text": t})
    ds = rd.from_items(docs)
    out = winnow_overlap_pairs(ds, "text", "doc_id", min_shared=2).to_pandas()
    assert len(out) == 1
    assert (int(out["id_a"][0]), int(out["id_b"][0])) == (2, 7)
    assert out["n_shared"][0] >= 2
    assert 0 < out["overlap"][0] <= 1.0

    # layout invariance: same answer from a different partitioning
    out2 = winnow_overlap_pairs(
        rd.from_items(docs).repartition(5), "text", "doc_id", min_shared=2
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        out2.sort_values(["id_a", "id_b"]).reset_index(drop=True),
    )

    # no overlap anywhere -> empty with stable schema
    clean = winnow_overlap_pairs(
        rd.from_items(
            [{"doc_id": i, "text": rng_texts[i]} for i in range(10)]
        ),
        "text",
        "doc_id",
    ).to_pandas()
    assert len(clean) == 0
    # empty Datasets may round-trip schemaless (documented engine-wide
    # caveat); when columns survive they must be the declared four
    assert list(clean.columns) in ([], ["id_a", "id_b", "n_shared", "overlap"])


def test_group_all_pairs_matches_per_group_reference():
    """`_group_all_pairs` (the vectorized all-groups-at-once pair
    builder behind the MinHash/incremental LSH candidate stage) must
    emit exactly the per-group reference semantics: sort by `order`,
    drop duplicate ids (first occurrence wins), cap, then all in-group
    (earlier, later) pairs — later side only when droppable."""
    import numpy as np
    import pandas as pd

    from textextract_ray.stages.dedup import _group_all_pairs

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "band_id": rng.integers(0, 5, 2000),
            "band_key": rng.integers(0, 50, 2000).astype(str),
            "id": rng.integers(0, 500, 2000),
            "_rank": rng.integers(0, 2, 2000).astype(np.int32),
        }
    )

    def reference(df, order, droppable, cap):
        outs = []
        d2 = df[df.duplicated(["band_id", "band_key"], keep=False)]
        for _, g in d2.groupby(["band_id", "band_key"], sort=True):
            g = g.sort_values(order, kind="stable").drop_duplicates("id").head(cap)
            ids = g["id"].to_numpy()
            lo, hi = np.triu_indices(len(ids), k=1)
            if droppable:
                keep = (g["_rank"].to_numpy() > 0)[hi]
                outs.append(
                    pd.DataFrame({"id": ids[hi[keep]], "keep_id": ids[lo[keep]]})
                )
            else:
                outs.append(pd.DataFrame({"id": ids[hi], "keep_id": ids[lo]}))
        if not outs:
            return pd.DataFrame({"id": [], "keep_id": []})
        return pd.concat(outs, ignore_index=True)

    cases = [
        (["id"], False, 1024),
        (["id"], False, 3),  # exercises the cap filter
        (["_rank", "id"], True, 1024),
        (["_rank", "id"], True, 4),
    ]
    for order, drop, cap in cases:
        want = reference(df, order, drop, cap)
        got = _group_all_pairs(
            df,
            ["band_id", "band_key"],
            cap=cap,
            order=order,
            droppable_col="_rank" if drop else None,
        )
        assert sorted(map(tuple, want.to_numpy())) == sorted(
            map(tuple, got.to_numpy())
        ), (order, drop, cap)

    # empty input and all-singleton input both give a typed empty frame
    for empty_in in (df.iloc[:0], df.drop_duplicates(["band_id", "band_key"])):
        out = _group_all_pairs(
            empty_in.drop_duplicates(["band_id", "band_key"]),
            ["band_id", "band_key"],
        )
        assert len(out) == 0 and list(out.columns) == ["id", "keep_id"]


def test_exact_dedup_arms_and_guards(ray_session):
    """The keys-only loser-scan arm, the past-budget bucketed arm, and
    the duplicate-id guard must all produce the grouped min-id-winner
    answer."""
    import ray.data as rd

    from textextract_ray.stages.dedup import exact_dedup

    rows = [
        {"doc_id": 5, "text": "alpha"},
        {"doc_id": 2, "text": "alpha"},
        {"doc_id": 9, "text": "beta"},
        {"doc_id": 1, "text": "gamma"},
        {"doc_id": 7, "text": "beta"},
    ]
    want = [(1, "gamma"), (2, "alpha"), (7, "beta")]

    def got(**kw):
        out = exact_dedup(rd.from_items(rows), "text", "doc_id", **kw).to_pandas()
        return sorted(zip(out["doc_id"].astype(int), out["text"]))

    assert got() == want  # fold arm
    assert got(fold_budget_rows=2) == want  # forced bucketed arm
    # duplicate ids (one id, two texts) must route to the grouped arm:
    # filter-by-id would over-drop doc 1's surviving text
    dup = rows + [{"doc_id": 1, "text": "alpha"}]
    out = exact_dedup(rd.from_items(dup), "text", "doc_id").to_pandas()
    assert sorted(zip(out["doc_id"].astype(int), out["text"])) == [
        (1, "alpha"),
        (1, "gamma"),
        (7, "beta"),
    ]


def test_bucketed_group_apply_frame_fn_distributed_arm(ray_session):
    """Forcing the past-budget bucketed arm must give the same pairs
    as the driver fold when a `frame_fn` (vectorized all-groups body)
    is used — the frame_fn runs inside map_groups there."""
    import numpy as np
    import ray.data as rd

    from textextract_ray.stages.dedup import (
        _bucketed_group_apply,
        _group_all_pairs,
    )

    rng = np.random.default_rng(11)
    n = 3000
    rows = [
        {
            "band_id": int(b),
            "band_key": f"k{k}",
            "id": int(i),
        }
        for b, k, i in zip(
            rng.integers(0, 4, n), rng.integers(0, 60, n), rng.integers(0, 800, n)
        )
    ]
    ds = rd.from_items(rows).repartition(7)
    fn = lambda df: _group_all_pairs(df, ["band_id", "band_key"])
    a = _bucketed_group_apply(
        ds, ["band_id", "band_key"], None, frame_fn=fn
    ).to_pandas()
    b = _bucketed_group_apply(
        ds, ["band_id", "band_key"], None, frame_fn=fn, fold_budget_rows=10
    ).to_pandas()
    assert len(a) > 0
    assert sorted(map(tuple, a.to_numpy())) == sorted(map(tuple, b.to_numpy()))


def test_minhash_string_ids_past_budget_arm(ray_session, monkeypatch):
    """String doc ids through the past-budget map_groups arm: buckets
    that find zero pairs must emit string-typed empty blocks (an int64
    empty would break schema unification against the pair-bearing
    string blocks)."""
    import ray.data as rd

    import textextract_ray.stages.fold as fold_mod
    from textextract_ray.stages.dedup import minhash_duplicate_assignments

    texts = [
        " ".join(f"w{i}x{j}" for j in range(40)) for i in range(60)
    ]
    texts[7] = texts[3] + " tail"  # one near-dup pair
    rows = [{"doc_id": f"doc-{i:03d}", "text": t} for i, t in enumerate(texts)]
    ds = rd.from_items(rows).repartition(6)

    monkeypatch.setattr(
        fold_mod, "fold_partials", lambda *a, **k: None
    )  # force the bucketed map_groups arm everywhere
    pairs = minhash_duplicate_assignments(ds, "text", "doc_id").to_pandas()
    assert len(pairs) == 1
    assert set(pairs.iloc[0][["id", "keep_id"]]) == {"doc-003", "doc-007"}
    assert pairs["id"].dtype == object


def test_exact_dedup_null_ids(ray_session):
    """Null ids route to the grouped arm and must not crash: min
    non-null id wins its hash group; an all-null-id group keeps
    exactly one row."""
    import pandas as pd
    import ray.data as rd

    from textextract_ray.stages.dedup import exact_dedup

    rows = pd.DataFrame(
        {
            "doc_id": pd.array([1, None, 3, None, None], dtype="Int64"),
            "text": ["aaa", "bbb", "aaa", "bbb", "ccc"],
        }
    )
    out = exact_dedup(rd.from_pandas(rows), "text", "doc_id").to_pandas()
    assert sorted(out["text"]) == ["aaa", "bbb", "ccc"]
    assert int(out.loc[out["text"] == "aaa", "doc_id"].iloc[0]) == 1
