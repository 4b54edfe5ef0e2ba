"""Cross-run incremental dedup via the shared seen-url index."""

from __future__ import annotations


def test_streaming_dedup_across_runs(ray_session):
    import ray.data as rd

    from textextract_ray.state.seen_index import SeenUrlIndex, streaming_dedup

    index = SeenUrlIndex(num_shards=3)
    run1 = rd.from_items([{"url": f"https://h/{i}", "x": 1} for i in range(50)])
    out1 = streaming_dedup(run1, index).to_pandas()
    assert len(out1) == 50
    assert index.total_size() == 50

    # second run: 30 overlap, 20 new, plus internal duplicates
    rows = [{"url": f"https://h/{i}", "x": 2} for i in range(30, 80)]
    rows += [{"url": "https://h/70", "x": 3}] * 2
    out2 = streaming_dedup(rd.from_items(rows), index).to_pandas()
    assert set(out2["url"]) == {f"https://h/{i}" for i in range(50, 80)}
    assert len(out2) == 30  # internal dups dropped too
    assert index.total_size() == 80


def test_index_shard_atomicity(ray_session):
    from textextract_ray.state.seen_index import SeenUrlShard

    import ray

    shard = SeenUrlShard.remote()
    a = ray.get(shard.check_and_add.remote(["u1", "u2", "u1"]))
    assert a == [False, False, True]
    b = ray.get(shard.check_and_add.remote(["u2", "u3"]))
    assert b == [True, False]
