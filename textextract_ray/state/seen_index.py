"""Sharded shared seen-url index — the one raw-actor component.

Everything else in this engine is a Dataset op; this is the case the
Dataset API genuinely cannot express: a MUTABLE index shared across
separate pipeline runs (incremental ingest — today's crawl must drop
urls already extracted last week, without re-shuffling or re-reading
last week's output).

Design: N index-shard actors, urls routed by crc32(url) % N (the same
hash family as the layout pass, so one url always hits one shard).
``check_and_add`` is atomic per shard — within a shard, the first
caller to present a url wins, every later caller is told "dup". Batches
probe their shards with one RPC per (batch, shard) pair, not per row.

Scale notes: per-shard memory is a Python set of url strings — swap for
a Bloom filter / RocksDB-backed set per shard when the corpus outgrows
RAM; the interface stays. Throughput scales with N shards. Within a
single bounded run, prefer ``dedup_by_url`` (a shuffle beats N×RPC);
the index earns its cost only across runs.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

import ray


@ray.remote(num_cpus=0.1)
class SeenUrlShard:
    """One shard of the index. Actor methods execute serially per
    actor, which is exactly the atomicity the check-and-add needs."""

    def __init__(self):
        self._seen = set()

    def check_and_add(self, urls: list) -> list:
        """For each url: True if it was already present (duplicate),
        False if newly added by this call."""
        seen = self._seen
        out = []
        for u in urls:
            if u in seen:
                out.append(True)
            else:
                seen.add(u)
                out.append(False)
        return out

    def size(self) -> int:
        return len(self._seen)


class SeenUrlIndex:
    """Driver-side handle bundle for the sharded index."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [SeenUrlShard.remote() for _ in range(num_shards)]

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def streaming_dedup(ds, index: SeenUrlIndex):
    """Drop rows whose url was already seen by ANY prior run that used
    the same index (and dedup within this run, first-wins per shard).

    Each batch makes one ``check_and_add`` RPC per touched shard.
    Note: unlike ``dedup_by_url`` this is arrival-order dependent
    across racing batches — fine for ingest (any single copy is
    acceptable; rows for a url are identical), wrong for workloads
    needing a value-deterministic winner.
    """
    shards = index.shards
    n = index.num_shards

    def filter_seen(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        by_shard: dict = {}
        for i, u in enumerate(urls):
            by_shard.setdefault(zlib.crc32(u.encode()) % n, []).append(i)
        keep = [True] * len(urls)
        futures = {
            sid: shards[sid].check_and_add.remote([urls[i] for i in idxs])
            for sid, idxs in by_shard.items()
        }
        for sid, idxs in by_shard.items():
            dup_flags = ray.get(futures[sid])
            for i, dup in zip(idxs, dup_flags):
                keep[i] = not dup
        return batch.filter(pa.array(keep))

    return ds.map_batches(filter_seen, batch_format="pyarrow")
