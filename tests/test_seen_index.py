"""Cross-run incremental dedup via the shared seen-url index."""

from __future__ import annotations


def test_streaming_dedup_across_runs(ray_session):
    import ray.data as rd

    from textextract_ray.state.seen_index import SeenUrlIndex, streaming_dedup

    index = SeenUrlIndex(num_shards=3)
    run1 = rd.from_items([{"url": f"https://h/{i}", "x": 1} for i in range(50)])
    out1 = streaming_dedup(run1, index, run_id="run1").to_pandas()
    assert len(out1) == 50
    assert index.total_size() == 50

    # second run: 30 overlap, 20 new, plus internal duplicates
    rows = [{"url": f"https://h/{i}", "x": 2} for i in range(30, 80)]
    rows += [{"url": "https://h/70", "x": 3}] * 2
    out2 = streaming_dedup(rd.from_items(rows), index, run_id="run2").to_pandas()
    assert set(out2["url"]) == {f"https://h/{i}" for i in range(50, 80)}
    assert len(out2) == 30  # internal dups dropped too
    assert index.total_size() == 80


def test_index_shard_claim_semantics(ray_session):
    import ray

    from textextract_ray.state.seen_index import SeenUrlShard

    shard = SeenUrlShard.remote()
    a = ray.get(shard.claim.remote(["u1", "u2"], "owner-A"))
    assert a == [True, True]
    # same owner re-presents (task retry): idempotent keep
    assert ray.get(shard.claim.remote(["u1", "u2"], "owner-A")) == [True, True]
    # different owner: dropped; new url: claimed
    assert ray.get(shard.claim.remote(["u2", "u3"], "owner-B")) == [False, True]


def test_streaming_dedup_survives_reexecution(ray_session):
    """Plan fan-out re-executes the upstream filter; owner-based claims
    must not lose rows (the naive seen-set would)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from textextract_ray.state.seen_index import SeenUrlIndex, streaming_dedup

    index = SeenUrlIndex(num_shards=2)
    ds = rd.from_items([{"url": f"https://h/{i}", "v": i} for i in range(40)])
    fresh = streaming_dedup(ds, index, run_id="runX")
    # two downstream branches, each re-executing the dedup stage
    lo = fresh.map_batches(
        lambda t: t.filter(pc.less(t["v"], 20)), batch_format="pyarrow"
    )
    hi = fresh.map_batches(
        lambda t: t.filter(pc.greater_equal(t["v"], 20)), batch_format="pyarrow"
    )
    out = lo.union(hi).to_pandas()
    assert sorted(out["v"]) == list(range(40))  # no rows lost
