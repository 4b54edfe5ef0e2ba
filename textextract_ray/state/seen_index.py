"""Sharded shared seen-url index — the one raw-actor component.

Everything else in this engine is a Dataset op; this is the case the
Dataset API genuinely cannot express: a MUTABLE index shared across
separate pipeline runs (incremental ingest — today's crawl must drop
urls already extracted last week, without re-shuffling or re-reading
last week's output).

Design: N index-shard actors, urls routed by crc32(url) % N (the same
hash family as the layout pass, so one url always hits one shard).
Shard methods execute serially per actor — that is the check-and-claim
atomicity.

IDEMPOTENCE (the subtle part): a Ray map task can run MORE THAN ONCE
over the same rows — task retries, or plan fan-out re-executing a
shared upstream. A naive seen-set would drop those rows on the second
execution and silently lose data. Instead each url is CLAIMED by an
owner token derived from the batch's content (hash of its sorted url
list): re-executing the same batch presents the same owner and keeps
its rows; any other batch presenting the url is told to drop it.

Scale notes: per-shard memory is a Python dict url→owner — swap for a
RocksDB-backed map per shard when the corpus outgrows RAM; the
interface stays. Throughput scales with shard count. Within a single
bounded run, prefer ``dedup_by_url`` (a shuffle beats N×RPC per batch);
the index earns its cost only across runs/increments.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class SeenUrlShard:
    """One shard of the index. num_cpus=0: a memory cell doing dict
    lookups must never compete with extraction pools / read tasks for
    CPU slots (reserving even 0.1×shards can starve a small cluster
    into deadlock)."""

    def __init__(self):
        self._owner: dict = {}

    def claim(self, urls: list, owner: str) -> list:
        """For each url: True if this owner holds (or just acquired)
        the claim — keep the row; False if another owner holds it —
        drop. Idempotent for re-presentation by the same owner."""
        table = self._owner
        out = []
        for u in urls:
            holder = table.setdefault(u, owner)
            out.append(holder == owner)
        return out

    def size(self) -> int:
        return len(self._owner)


class SeenUrlIndex:
    """Driver-side handle bundle for the sharded index."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [SeenUrlShard.remote() for _ in range(num_shards)]

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def streaming_dedup(ds, index: SeenUrlIndex, run_id: str):
    """Drop rows whose url is claimed by any other batch/run sharing
    the same index; keep exactly one claimant per url. Within a batch,
    later duplicates of a url are dropped locally.

    Safe under task re-execution: the owner token hashes ``run_id``
    PLUS the batch's url set, so a retried task (same run, same batch
    content) reclaims its own rows, while a different run presenting
    the same urls is refused. ``run_id`` must be stable for the run and
    unique across runs (e.g. the increment id) — content alone is NOT
    enough: two runs can produce identically-composed batches (think
    single-row batches of the same url), which would collide and leak
    duplicates through.

    Unlike ``dedup_by_url`` the surviving copy is arrival-order
    dependent across racing batches — fine for ingest (rows for a url
    are identical), wrong when a value-deterministic winner is needed.
    """
    shards = index.shards
    n = index.num_shards

    from ..functions.scalar import stable_bucket

    def filter_seen(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()  # may contain None: claimable
        # exactly once like any other key; downstream validation flags it
        # owner = run_id + full batch content (Arrow IPC bytes): a
        # retried/re-executed task presents bit-identical content and
        # reclaims; any other batch is refused. Residual caveat: two
        # DISTINCT batches with bit-identical full content collide —
        # but then their rows are identical too, so the failure mode is
        # a redundant identical row (catchable by dedup_by_url), never
        # data loss. Hashing cost is ~GB/s, negligible next to parsing.
        import io

        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_table(batch)
        owner = hashlib.blake2b(
            run_id.encode() + b"\x00" + sink.getbuffer(), digest_size=16
        ).hexdigest()
        # local first-occurrence wins within the batch
        first_idx: dict = {}
        for i, u in enumerate(urls):
            first_idx.setdefault(u, i)
        shard_of = stable_bucket(list(first_idx.keys()), n)  # THE shared hash
        by_shard: dict = {}
        for (u, i), sid in zip(first_idx.items(), shard_of):
            by_shard.setdefault(int(sid), []).append((u, i))
        keep = [False] * len(urls)
        futures = {
            sid: shards[sid].claim.remote([u for u, _ in pairs], owner)
            for sid, pairs in by_shard.items()
        }
        for sid, pairs in by_shard.items():
            flags = ray.get(futures[sid])
            for (u, i), ok in zip(pairs, flags):
                keep[i] = ok
        return batch.filter(pa.array(keep, type=pa.bool_()))

    return ds.map_batches(filter_seen, batch_format="pyarrow")
