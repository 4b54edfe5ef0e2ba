"""The flagship pipeline: pages → validate → extract → dedup → commit.

Lifecycle mapping (SURVEY.md §3.4): read_parquet(shards) [the request
queue] → annotate/validate (M1/M7) → actor-pool extract (M4/A1) →
exact dedup by url (D2, the one true shuffle) → partitioned write with
manifest commit (S3/D1/S8 rename idiom) → counters aggregation
(G1-G6) → driver-side report join (J2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import read_pages
from ..stages.extract import extract_pages
from ..stages.metrics import aggregate_counters, counters_report
from ..stages.validate import annotate_batch
from ..state import checkpoint


def extract_dataset(
    pages_ds,
    *,
    batch_size: int = 256,
    concurrency=None,
    giant_threshold: int | None = None,
    dedup: bool = True,
    canonicalize_urls: bool = False,
    validate_schema: bool = True,
):
    """pages Dataset -> extracted Dataset, optionally url-deduped
    (``canonicalize_urls=True`` keys the dedup on the canonical url —
    see dedup_by_url).

    ``validate_schema`` casts every batch to PAGES_SCHEMA at the
    pipeline boundary (explicit DDL-style validation — no inference at
    10^12 rows; a wrong column type fails fast with the stage name,
    not deep inside an actor)."""
    if validate_schema:
        from ..schemas import PAGES_SCHEMA, validate_table

        def validate_and_annotate(t: pa.Table) -> pa.Table:
            # fused into one stage: an extra map pass just for the cast
            # costs a full extra traversal of the html bytes
            return annotate_batch(
                validate_table(t, PAGES_SCHEMA, where="extract_dataset input")
            )

        stage_fn = validate_and_annotate
    else:
        stage_fn = annotate_batch
    annotated = pages_ds.map_batches(
        stage_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    extracted = extract_pages(
        annotated,
        batch_size=batch_size,
        concurrency=concurrency,
        giant_threshold=giant_threshold,
    )
    if dedup:
        extracted = dedup_by_url(extracted, canonicalize=canonicalize_urls)
    return extracted


class _CommitOverlap:
    """Background-commit machinery shared by ``run_job`` (manifest
    verify+commit, backlog ≤ 2) and ``run_job_versioned`` (table
    commit, one at a time): ``submit(pid, fn)`` runs ``fn`` on a
    daemon thread catching its failure; ``drain(n)`` joins until at
    most ``n`` are in flight; ``join_all()`` joins everything and
    re-raises the FIRST failure as ``RuntimeError("partition <pid>
    <what> failed")``. One copy so the error-surfacing / backlog
    semantics cannot drift between the two resume protocols."""

    def __init__(self, what: str):
        import threading

        self._threading = threading
        self.pending: list = []
        self.errors: dict = {}
        self.what = what

    def submit(self, pid: int, fn) -> None:
        def run():
            try:
                fn()
            except BaseException as exc:  # surfaced on join
                self.errors[pid] = exc

        t = self._threading.Thread(target=run, daemon=True)
        t.start()
        self.pending.append(t)

    def drain(self, n: int) -> None:
        while len(self.pending) > n:
            self.pending.pop(0).join()

    def join_all(self) -> None:
        self.drain(0)
        if self.errors:
            pid, exc = sorted(self.errors.items())[0]
            raise RuntimeError(
                f"partition {pid} {self.what} failed"
            ) from exc


# prefetch doubles per-task heap to 2× one shard buffer — cap the shard
# size it engages at (Common Crawl WARCs run ~1 GB; 256 MB × 2 keeps a
# task's buffers comfortably inside a 4 GB worker heap next to decode)
_HTTP_PREFETCH_MAX = 256 << 20


_http_size_cache: dict = {}


def _http_size_ok(url: str) -> bool:
    """ONE driver-side HEAD request on the first shard: prefetch-group
    only when Content-Length is known and under _HTTP_PREFETCH_MAX
    (crawl dumps are uniformly sized, so one probe stands for the
    list). Unknown size or probe failure → False: the one-buffer heap
    contract wins over the ~10% overlap gain. Memoized per url — the
    job loops call extract_files once per partition, and re-probing an
    unreachable-from-driver mirror would burn the 10 s timeout per
    partition while flapping the same answer."""
    if url in _http_size_cache:
        return _http_size_cache[url]
    import urllib.request

    try:
        req = urllib.request.Request(url, method="HEAD")
        with urllib.request.urlopen(req, timeout=10) as resp:
            n = resp.headers.get("Content-Length")
        ok = n is not None and int(n) <= _HTTP_PREFETCH_MAX
    except Exception:
        ok = False
    _http_size_cache[url] = ok
    return ok


def extract_files(
    paths,
    *,
    batch_size: int = 64,
    dedup: bool = True,
    canonicalize_urls: bool = False,
    validate_schema: bool = True,
    max_output_bytes: int | None = None,
):
    """Fused read+extract: ONE task per parquet shard decodes the shard
    worker-side and extracts in the same process — the html payload
    never enters the object store.

    Why this exists next to ``extract_dataset``: the Dataset path
    materializes every page block (url + html + metadata — the corpus'
    dominant bytes) into the object store between the read operator and
    the extract operator, and Ray 2.49's planner does not fuse
    ``ReadParquet`` with a downstream ``map_batches`` (measured: two
    ``TaskPoolMapOperator``s in every plan). At the bench corpus that
    round-trip is 6.5 GB of plasma memcpy plus parquet-decode running
    as its own CPU-contending operator — ~20% of extract wall at 16
    CPUs, and the first thing a 100 TB run would pay per node. Here the
    decode happens inside the extract task (exactly one shard per
    task, the same one-task-per-shard contract as ``read_arrow_shards``
    / ``read_pages_http`` / ``read_warc``), so only the ~10×-smaller
    extracted rows are ever stored. Output is byte-identical to
    ``extract_dataset(read_pages(paths))`` — same validate → annotate →
    ``ExtractBatch`` stages per ``batch_size`` slice (pinned by
    ``test_pipeline_e2e.test_fused_matches_dataset_path``).

    Trade documented: this is the ``giant_threshold=None`` single-pool
    shape; callers routing pathological giants to a dedicated pool use
    ``extract_dataset``. Shard size is the parallelism unit — at 100 TB
    keep shards at the usual 100-500 MB and the fan-out matches the
    cluster exactly as the Dataset path would.

    Shards may be ``.parquet`` OR ``.warc.gz`` (Common Crawl native —
    each archive streams record-at-a-time through the own WARC framing
    into the pages schema worker-side, same zero-plasma motion); a
    directory expands to both, and formats may mix in one list. Both
    formats decode INCREMENTALLY inside the task (parquet via
    ``ParquetFile.iter_batches``, WARC via chunked record accumulation),
    so worker heap is bounded by one decode chunk — not one shard —
    regardless of shard size.

    Shards may also be URIs (``http(s)://``, ``s3://``, any
    pyarrow/fsspec-resolvable scheme): each task opens ITS OWN shard
    stream through ``sources.open_shard`` — http(s) fetches the shard
    with the retry ladder (no Range support on bare mirrors), every
    other scheme gets a random-access filesystem handle so parquet row
    groups still decode incrementally. This is the 100-TB deployment
    shape: object-store shards keep the fused zero-plasma data motion
    instead of falling back to the read→plasma→extract round-trip
    (VERDICT r4 rank-1 item). One refinement for whole-file-fetch
    http(s) lists: shards group TWO per task with a background-thread
    prefetch of the next shard's bytes, so network wait overlaps
    extraction inside the task (measured 0.80×→0.90× of the pipelined
    Dataset path on an adversarial same-box localhost server;
    BASELINE.md round 5 has the full trade, including why fused stays
    the default — plasma holds ~10× fewer bytes at scale). Parity with
    the Dataset path over both ``file://`` and ``http://`` shard lists
    is pinned in ``test_uri_shards.test_fused_matches_dataset_path_uri``
    and ``test_http_source.test_fused_http_matches_local``.
    """
    import ray.data as rd

    from ..oracle import DEFAULT_MAX_OUTPUT_BYTES
    from ..schemas import PAGES_SCHEMA, validate_table
    from ..sources import expand_shards
    from ..stages.extract import (
        TRANSIENT_EXCEPTIONS,
        TRANSIENT_MAX_RETRIES,
        ExtractBatch,
        apply_transient_retry_policy,
    )

    shard_list = expand_shards(paths, (".parquet", ".warc.gz"))
    if not shard_list:
        raise ValueError("extract_files: no parquet/warc shards")
    apply_transient_retry_policy()
    out_bytes = (
        DEFAULT_MAX_OUTPUT_BYTES if max_output_bytes is None else max_output_bytes
    )
    decode_rows = max(batch_size, 4096)
    # http(s) shards: the whole-shard fetch (no Range support → one
    # buffered GET) would otherwise serialize with extraction inside
    # the task — the worker's slot idles on network for the full shard
    # transfer before any CPU work starts, costing ~20% wall vs the
    # pipelined Dataset path (measured, BASELINE.md round 5). Group two
    # shards per task and PREFETCH the next shard's bytes on a
    # background thread while the current one extracts: fetch overlaps
    # compute within the task, zero-plasma motion intact. Grouping
    # requires an ALL-http list (a mixed list would halve the local
    # shards' task parallelism for zero prefetch benefit — open_shard
    # on a local path is a string pass-through) and a bounded shard
    # size: while shard i extracts, shard i+1's buffer is ALSO live, so
    # per-task heap is 2× one shard. One driver-side HEAD probe of the
    # first shard checks Content-Length against _HTTP_PREFETCH_MAX
    # (crawl shards are uniformly sized); oversized or unprobeable →
    # one shard per task, the one-buffer heap contract holds. Random-
    # access schemes (file/s3-style) read incrementally per row group,
    # so their stall is already amortized — never grouped.
    from ..sources import is_http

    group2 = len(shard_list) >= 8 and all(is_http(p) for p in shard_list)
    if group2:
        group2 = _http_size_ok(shard_list[0])

    def fused(batch: pa.Table):
        import pyarrow.parquet as pq

        from ..sources import open_shard, warc_pages_chunks

        extractor = ExtractBatch(max_output_bytes=out_bytes)

        def chunks(path, src):
            # open_shard: local path string (mmap fast path) OR a
            # worker-side stream for URI shards — decode stays
            # incremental either way
            try:
                if path.endswith(".warc.gz"):
                    yield from warc_pages_chunks(src, rows_per_chunk=decode_rows)
                else:
                    for rb in pq.ParquetFile(src).iter_batches(
                        batch_size=decode_rows
                    ):
                        yield pa.Table.from_batches([rb])
            finally:
                if src is not path and hasattr(src, "close"):
                    src.close()

        paths_ = batch["path"].to_pylist()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(open_shard, paths_[0]) if paths_ else None
            try:
                for i, path in enumerate(paths_):
                    src = nxt.result()
                    nxt = (
                        pool.submit(open_shard, paths_[i + 1])
                        if i + 1 < len(paths_)
                        else None
                    )
                    for t in chunks(path, src):
                        if validate_schema:
                            t = validate_table(
                                t, PAGES_SCHEMA, where="extract_files input"
                            )
                        t = annotate_batch(t)
                        # slice-by-slice so extracted rows stream
                        # downstream (Ray coalesces yields into
                        # target-size output blocks)
                        for off in range(0, t.num_rows, batch_size):
                            yield extractor(t.slice(off, batch_size))
            finally:
                # a decode error in the CURRENT shard (or Ray closing
                # the streaming generator early) must not abandon the
                # in-flight prefetch handle — over max_retries task
                # retries that accumulates open remote files/sockets
                if nxt is not None:
                    try:
                        h = nxt.result(timeout=60)
                        if hasattr(h, "close"):
                            h.close()
                    except Exception:
                        pass

    n_blocks = (len(shard_list) + 1) // 2 if group2 else len(shard_list)
    extracted = rd.from_items(
        [{"path": p} for p in shard_list],
        override_num_blocks=n_blocks,
    ).map_batches(
        fused,
        batch_format="pyarrow",
        # plain tasks don't consume DataContext.actor_task_retry_on_errors
        # (Ray 2.49 reads it only in the actor-pool operator), so the
        # transient-retry contract rides the task's own remote args —
        # the shard READ I/O lives inside this task now, exactly where
        # a dropped NFS/object-store connection would surface
        retry_exceptions=list(TRANSIENT_EXCEPTIONS),
        # bounded: Ray Data task operators default to max_retries=-1,
        # which turns a permanently-dead shard (OSError class) into an
        # infinite task-respawn loop wedging the pipeline
        max_retries=TRANSIENT_MAX_RETRIES,
    )
    if dedup:
        extracted = dedup_by_url(extracted, canonicalize=canonicalize_urls)
    return extracted


DEDUP_DRIVER_BUDGET_ROWS = 200_000
DEDUP_DRIVER_BUDGET_BYTES = 1 << 30  # payload cap for the driver pull
# key-scan second-level combine: fold (8-byte hash, count) partials on
# the driver while they fit this many rows (~1.6 GB transient); past it
# the distributed coalesce+groupby arm engages (the 10^12-url regime)
SCAN_FOLD_BUDGET_ROWS = 100_000_000


def dedup_by_url(
    extracted_ds,
    *,
    num_buckets: int = 256,
    driver_budget_rows: int = DEDUP_DRIVER_BUDGET_ROWS,
    driver_budget_bytes: int = DEDUP_DRIVER_BUDGET_BYTES,
    canonicalize: bool = False,
):
    """Exact dedup by url — the shuffle carries KEYS, not payloads.

    The naive shape (bucket every extracted row by url hash, shuffle
    ALL of them, first-per-url inside the bucket) moves the entire
    extracted payload (text + spans) through an all-to-all — measured
    ~25-40% of partition wall time at the soak config, and at 100 TB it
    is the whole corpus through the object store for a dup fraction of
    a few percent. Instead:

    1. materialize the extracted partition once (partition-scale, not
       corpus-scale — this is what bounds it; it also stops the
       consumers below from re-executing the extract),
    2. key scan: find url-hash keys with count > 1 fully distributed —
       each batch pre-aggregates (hash, count) partials (8-byte keys,
       deduped within the batch), a small groupby sums them, and only
       the O(dup keys) result reaches the driver. No O(rows)
       ``to_pandas`` anywhere: a caller invoking this on an
       unpartitioned full corpus is safe, not just the partition-sized
       ``run_job`` path,
    3. stream-filter the unique-url rows with the broadcast dup-hash
       set (vectorized ``is_in``, no shuffle — the overwhelming
       majority of the data takes this path),
    4. resolve only the rare duplicate rows: pulled to the driver and
       deduped in Arrow when they fit BOTH ``driver_budget_rows`` and
       ``driver_budget_bytes`` (the byte budget guards against few-but-
       giant duplicate documents blowing the driver heap), else a
       bucketed groupby over just that subset (still key-partitioned,
       never the full payload).

    A hash collision routes a unique url into the dup path, where
    first-per-URL (the real string) keeps it — collisions cost a few
    extra rows in step 4, never correctness.

    The extractor is a pure function of the bytes, so duplicate urls
    carry rows identical in every content column (only the timing
    column varies) and ANY occurrence is a valid winner — content
    determinism does not depend on block arrival order. Stays in Arrow
    end-to-end (pandas would mangle the ``spans`` list column).

    ``canonicalize=True`` keys the dedup on ``canonicalize_url(url)``
    (tracking params / fragments / case / default ports stripped —
    functions.scalar) instead of the raw url, catching the
    same-page-different-tracking duplicates real crawls are full of.
    Opt-in: the output rows keep their original urls, raw-key behavior —
    including every golden fixture — is unchanged at the default, and
    the canonical key is computed ONCE into a materialized helper
    column (dropped before returning), not re-derived per filter pass.
    Unlike raw-key duplicates (byte-identical rows from the pure
    extractor), canonical-key duplicates can carry different content —
    so the winner is the MIN-RAW-URL row per key, deterministic under
    any block arrival order.
    """
    import numpy as np

    from ..functions.scalar import canonicalize_url

    key_col = "_ckey" if canonicalize else "url"

    def strip(dset):
        return dset.drop_columns(["_ckey"]) if canonicalize else dset

    if canonicalize:

        def add_key(batch: pa.Table) -> pa.Table:
            return batch.append_column("_ckey", canonicalize_url(batch["url"]))

        ds = extracted_ds.map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        ds = extracted_ds.materialize()

    def first_per_url(tbl: pa.Table) -> pa.Table:
        # winner per key = the min-raw-url row (within equal urls, any
        # row: they are byte-identical up to timing) — deterministic
        # regardless of block arrival order in BOTH key modes
        keys = np.asarray(tbl[key_col].to_pylist(), dtype=object)
        urls = np.asarray(tbl["url"].to_pylist(), dtype=object)
        order = np.lexsort((urls, keys))
        _, first_idx = np.unique(keys[order], return_index=True)
        return tbl.take(np.sort(order[first_idx]))

    return strip(
        _dedup_with_winner(
            ds,
            key_col,
            first_per_url,
            num_buckets=num_buckets,
            driver_budget_rows=driver_budget_rows,
            driver_budget_bytes=driver_budget_bytes,
        )
    )


def _dedup_with_winner(
    ds,
    key_col: str,
    winner_fn,
    *,
    num_buckets: int = 256,
    driver_budget_rows: int = DEDUP_DRIVER_BUDGET_ROWS,
    driver_budget_bytes: int = DEDUP_DRIVER_BUDGET_BYTES,
):
    """Shared keys-only dedup scaffold (``dedup_by_url``,
    ``latest_snapshot_ds``): a distributed (8-byte hash, count)
    partial scan finds the duplicate KEYS; unique-key rows — the
    overwhelming majority — stream through a vectorized ``is_in``
    filter untouched; only the rare duplicate rows resolve through
    ``winner_fn(table) -> table`` (one winner row per key), driver-side
    when the subset fits BOTH budgets, else via a key-bucketed groupby
    over just that subset. The corpus payload never rides a shuffle.

    A hash collision routes a unique key into the winner path, where
    ``winner_fn`` sees the real key string and keeps it — collisions
    cost a few extra resolved rows, never correctness. ``ds`` must be
    materialized by the caller (bounds the scan and stops the two
    consumers from re-executing the upstream pipeline)."""
    import ray as _ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..functions.scalar import stable_bucket, stable_hash64

    def key_hash_partials(batch: pa.Table) -> pa.Table:
        # per-batch partial counts: the shuffle ships (8-byte key,
        # count) rows already deduped within the batch
        hh = stable_hash64(batch[key_col])
        uh, cnt = np.unique(hh, return_counts=True)
        return pa.table(
            {
                # int64 view of the uint64 hash (bijective; Ray's
                # groupby/sort handles int64 natively)
                "h": pa.array(uh.astype(np.int64), pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    def only_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n_rows"], 1))

    # Second-level combine ladder. The partials are already pre-combined
    # per block, so their total is ~O(distinct keys) 16-byte rows — but
    # a Ray groupby over MANY tiny partial blocks pays the all-to-all's
    # fixed cost per block (measured 6.7s for 24k keys in 256 blocks at
    # the bench config, vs 1.2s for a driver fold). So: stream the
    # partials to the driver and fold in numpy while they fit
    # SCAN_FOLD_BUDGET_ROWS (a ~1.6 GB bound on driver transients);
    # past the budget — the 10^12-distinct-url regime — fall back to
    # the distributed groupby, coalesced first so the shuffle sees few
    # large blocks instead of thousands of tiny ones. Both arms are
    # exact; results are identical.
    parts = ds.map_batches(key_hash_partials, batch_format="pyarrow")
    folded_h: list = []
    folded_n: list = []
    seen_rows = 0
    for b in parts.iter_batches(
        batch_size=None, batch_format="pyarrow", prefetch_batches=16
    ):
        folded_h.append(b["h"].to_numpy(zero_copy_only=False))
        folded_n.append(b["n"].to_numpy(zero_copy_only=False))
        seen_rows += b.num_rows
        if seen_rows > SCAN_FOLD_BUDGET_ROWS:
            break
    if seen_rows <= SCAN_FOLD_BUDGET_ROWS:
        if seen_rows == 0:
            return ds
        h_all = np.concatenate(folded_h)
        uh, inv = np.unique(h_all, return_inverse=True)
        tot = np.bincount(inv, weights=np.concatenate(folded_n))
        dup_h = uh[tot > 1].astype(np.uint64)
        n_dup_rows_est = int(tot[tot > 1].sum())
    else:
        folded_h = folded_n = None  # release before the distributed arm

        def combine(batch: pa.Table) -> pa.Table:
            h = batch["h"].to_numpy(zero_copy_only=False)
            n = batch["n"].to_numpy(zero_copy_only=False)
            uh, inv = np.unique(h, return_inverse=True)
            return pa.table(
                {
                    "h": pa.array(uh, pa.int64()),
                    "n": pa.array(
                        np.bincount(inv, weights=n).astype(np.int64), pa.int64()
                    ),
                }
            )

        parts_m = parts.materialize()
        dup_df = (
            parts_m.repartition(max(32, parts_m.num_blocks() // 32))
            .map_batches(combine, batch_format="pyarrow")
            .groupby("h")
            .aggregate(Sum("n", alias_name="n_rows"))
            .map_batches(only_dups, batch_format="pyarrow")
            .to_pandas()  # O(dup keys), not O(rows)
        )
        # an all-filtered map_batches output can round-trip with no columns
        if "h" not in dup_df.columns or len(dup_df) == 0:
            return ds
        dup_h = dup_df["h"].to_numpy().astype(np.uint64)
        n_dup_rows_est = int(dup_df["n_rows"].sum())
    if len(dup_h) == 0:
        return ds
    dup_ref = _ray.put(pa.array(dup_h, pa.uint64()))

    def dup_mask(batch: pa.Table):
        hh = pa.array(stable_hash64(batch[key_col]), pa.uint64())
        return pc.fill_null(pc.is_in(hh, value_set=_ray.get(dup_ref)), False)

    def keep_unique(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(dup_mask(batch)))

    def keep_dup(batch: pa.Table) -> pa.Table:
        return batch.filter(dup_mask(batch))

    uniq = ds.map_batches(keep_unique, batch_format="pyarrow")
    # materialized so the byte size is known up front AND the past-
    # budget arm reads these blocks instead of re-filtering ds
    dups = ds.map_batches(keep_dup, batch_format="pyarrow").materialize()
    if n_dup_rows_est <= driver_budget_rows and (
        (dups.size_bytes() or 0) <= driver_budget_bytes
    ):
        # rare-duplicate fast path: the subset fits the driver; one
        # Arrow pass picks the winners, re-shipped as a single block
        tables = [t for t in _ray.get(dups.to_arrow_refs()) if len(t)]
        winners = winner_fn(pa.concat_tables(tables).combine_chunks())
        return uniq.union(rd.from_arrow(winners))

    def winner_per_bucket(bucket: pa.Table) -> pa.Table:
        return winner_fn(bucket.drop_columns(["url_bucket"]))

    def bucketize(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "url_bucket",
            pa.array(stable_bucket(batch[key_col], num_buckets), pa.int32()),
        )

    resolved = (
        dups.map_batches(bucketize, batch_format="pyarrow")
        .groupby("url_bucket")
        .map_groups(winner_per_bucket, batch_format="pyarrow")
    )
    return uniq.union(resolved)


def latest_snapshot_ds(
    pages_ds,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "html",
    num_buckets: int = 256,
    driver_budget_rows: int = DEDUP_DRIVER_BUDGET_ROWS,
    driver_budget_bytes: int = DEDUP_DRIVER_BUDGET_BYTES,
):
    """Multi-dump crawl consolidation: keep, per url, the NEWEST
    capture (max ``ts_col``) — the standard first step when a corpus
    spans several Common-Crawl dumps and a recrawled url appears once
    per dump. The winner is a pure order statistic — max (warc_ts,
    then content hash, then everything-else-is-identical) — so
    equal-timestamp recaptures resolve deterministically under any
    block arrival order or layout; a content-hash tie with different
    bytes is a ~2^-64 hash collision (documented, same family as the
    engine's other hash verdicts).

    Scale shape: the shared keys-only scaffold (``_dedup_with_winner``,
    same as ``dedup_by_url``): an (8-byte url-hash, count) partial scan
    finds recrawled urls; single-capture urls — the majority within one
    dump set — stream through untouched; only the recaptured rows
    resolve (driver-side under the budgets, bucketed groupby past
    them). The html payload never rides an all-to-all."""
    from ..functions.scalar import hash_utf8

    ds = pages_ds.materialize()

    def newest_per_url(tbl: pa.Table) -> pa.Table:
        urls = np.asarray(tbl[url_col].to_pylist(), dtype=object)
        ts = tbl[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        content = tbl[content_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        h2 = hash_utf8(pc.fill_null(content, b""), seed=0)
        # lexsort: last key is primary -> url asc, then ts desc, h2
        # desc (~h2 = 2^64-1-h2 is the overflow-safe uint64 descending key)
        order = np.lexsort((~h2, -ts, urls))
        _, first_idx = np.unique(urls[order], return_index=True)
        return tbl.take(np.sort(order[first_idx]))

    return _dedup_with_winner(
        ds,
        url_col,
        newest_per_url,
        num_buckets=num_buckets,
        driver_budget_rows=driver_budget_rows,
        driver_budget_bytes=driver_budget_bytes,
    )


def crawl_delta_ds(
    old_ds,
    new_ds,
    *,
    url_col: str = "url",
    content_col: str = "html",
    include_unchanged: bool = False,
    num_buckets: int = 256,
):
    """Dump-over-dump crawl delta: classify every url across two crawl
    snapshots as ``added`` (new dump only), ``removed`` (old dump
    only), ``changed`` (both, different content) or ``unchanged``
    (both, identical content; emitted only with
    ``include_unchanged=True`` — at corpus scale the unchanged class
    IS the corpus, the delta is the interesting O(churn) result).
    This is the incremental-recrawl planner: feed ``added``+``changed``
    to extraction, retire ``removed``.

    Inputs are consolidated snapshots (one capture per url per side —
    run ``latest_snapshot_ds`` first on multi-capture dumps; stray
    duplicates within a side collapse by max content hash before
    classification, so the result is still deterministic).

    Scale shape: each side ships (url, 8-byte content hash, side) into
    ONE coarse-bucketed groupby — html never rides the all-to-all, and
    per-url dispatch is avoided exactly as in `_bucketed_group_apply`
    (O(num_buckets) groups, vectorized pandas inside). Content
    equality is hash equality: a ~2^-64-per-pair false ``unchanged``
    is the engine's documented hash-verdict trade."""
    from ..functions.scalar import hash_utf8, stable_bucket

    def keyed(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            content = batch[content_col]
            if isinstance(content, pa.ChunkedArray):
                content = content.combine_chunks()
            fill = (
                b""
                if pa.types.is_binary(content.type)
                or pa.types.is_large_binary(content.type)
                else ""
            )
            h = hash_utf8(pc.fill_null(content, fill), seed=0)
            return pa.table(
                {
                    url_col: batch[url_col],
                    "h": pa.array(h.view(np.int64), pa.int64()),
                    "side": pa.array(np.full(len(h), side, np.int8), pa.int8()),
                    "_bucket": pa.array(
                        stable_bucket(batch[url_col], num_buckets), pa.int32()
                    ),
                }
            )

        return fn

    keys = old_ds.map_batches(keyed(0), batch_format="pyarrow").union(
        new_ds.map_batches(keyed(1), batch_format="pyarrow")
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 throughout: a plain unstack would coerce the
        # 64-bit hashes to float64 (53-bit mantissa), letting two
        # DIFFERENT hashes compare equal and a changed page classify
        # unchanged — ~2^11 worse than the documented 2^-64 trade
        per_side = (
            df.groupby([url_col, "side"])["h"]
            .max()
            .astype("Int64")
            .unstack("side")
        )
        old_h = (
            per_side[0]
            if 0 in per_side.columns
            else pd.Series(pd.NA, index=per_side.index, dtype="Int64")
        )
        new_h = (
            per_side[1]
            if 1 in per_side.columns
            else pd.Series(pd.NA, index=per_side.index, dtype="Int64")
        )
        has_old = old_h.notna().to_numpy()
        has_new = new_h.notna().to_numpy()
        differs = (old_h != new_h).fillna(False).to_numpy()
        change = np.where(
            ~has_old,
            "added",
            np.where(~has_new, "removed",
                     np.where(differs, "changed", "unchanged")),
        )
        out = pd.DataFrame({url_col: per_side.index, "change": change})
        if not include_unchanged:
            out = out[out["change"] != "unchanged"]
        return out.reset_index(drop=True)

    return keys.groupby("_bucket").map_groups(classify, batch_format="pandas")


def _ensure_partition_dir(pdir: str) -> None:
    """write_parquet of an EMPTY dataset creates no directory at all
    (verified on this Ray version) — an all-duplicate or all-filtered
    partition would then crash the read-back verify. Materialize the
    empty partition as one zero-row parquet file with the output
    schema so downstream reads and counters see a real (empty) table."""
    import os

    import pyarrow.parquet as pq

    from ..schemas import EXTRACTED_SCHEMA
    from ..state.checkpoint import fs_isdir, fs_listdir, fs_makedirs

    if not fs_isdir(pdir) or not any(
        f.endswith(".parquet") for f in fs_listdir(pdir)
    ):
        fs_makedirs(pdir)
        pq.write_table(
            EXTRACTED_SCHEMA.empty_table(), os.path.join(pdir, "empty-0.parquet")
        )


# Partition-sizing target for shards_per_partition=None: docs per
# partition per cluster CPU. Measured on the 96k-doc soak (BASELINE.md
# round-2): 12k docs/partition on 32 CPUs under-saturates the cluster
# (413 docs/s), 24k saturates it (662 docs/s, 86% of the
# non-checkpointed headline); ~750 docs/CPU puts a partition in the
# saturated regime while keeping resume granularity in the minutes.
PARTITION_TARGET_DOCS_PER_CPU = 750


def _auto_shards_per_partition(shard_files: list) -> int:
    """Pick shards_per_partition so one partition saturates the
    cluster: read ONLY parquet footers (row counts) of a shard sample,
    target PARTITION_TARGET_DOCS_PER_CPU × cluster CPUs docs per
    partition."""
    import pyarrow.parquet as pq

    import ray as _ray

    if not shard_files:
        raise ValueError("no input shards: shard_files is empty")
    ncpu = (
        int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    )
    from ..sources import open_shard

    sample = shard_files[:: max(1, len(shard_files) // 16)][:16]
    # URI shard lists size from footers too. Random-access schemes read
    # metadata-only through their handle (closed after the footer);
    # http has no Range support, so each sampled shard is a FULL
    # driver-side download — cap those at 2 (crawl shards are uniformly
    # sized; 16 full fetches before any extraction starts would cost
    # GBs of driver traffic for a number the median barely moves).
    from ..sources import is_http

    http_seen = 0
    rows = []
    for f in sample:
        if not f.endswith(".parquet"):
            continue  # warc shards have no footer; see fallback below
        if is_http(f):
            if http_seen >= 2:
                continue
            http_seen += 1
        src = open_shard(f)
        try:
            rows.append(pq.ParquetFile(src).metadata.num_rows)
        finally:
            if src is not f and hasattr(src, "close"):
                src.close()
    if not rows:
        # all-warc sample: row counts need a full archive scan (no
        # footer metadata), so auto-sizing has nothing cheap to read —
        # fall back to the fixed default rather than crash or scan
        return min(4, len(shard_files))
    per_shard = max(1, int(np.median(rows)))
    target = PARTITION_TARGET_DOCS_PER_CPU * ncpu
    return max(1, min(len(shard_files), round(target / per_shard)))


def run_job_versioned(
    shard_files: list,
    table_dir: str,
    *,
    shards_per_partition: int | None = 4,
    batch_size: int = 256,
    key_col: str = "url",
    fail_at_partition: int | None = None,
    tag: str | None = None,
) -> pd.DataFrame:
    """The resumable extraction job committing INTO the versioned table
    log: each partition publishes as one atomic table version (first as
    an append, later ones as copy-on-write MERGE by ``key_col``), so
    extraction output gets time travel, change feeds, compaction and
    retention GC for free — ``ingest_dumps_versioned`` proved the
    composition per dump; this is the same contract at the primary
    entry point's partition granularity (VERDICT r4 item 6).

    Resume protocol: each committing manifest is stamped
    ``note="job-part:<pid>:<sha1(shards)[:12]>:v<extractor_version>"``
    and carries the partition counters + lineage in the manifest
    ``meta``; a rerun skips any partition whose (hash, version) note is
    already in ``table_notes`` (notes survive retention GC). A same-pid
    note with a DIFFERENT shard hash means the caller re-partitioned
    the input — fail loudly, exactly like the manifest lineage guard in
    ``run_job``. A same-hash note from an OLDER extractor version means
    the parser was upgraded: the partition RE-extracts and merges
    (latest capture of each url supersedes the stale-version rows; the
    pre-upgrade snapshot stays time-travelable) — the versioned-path
    analogue of ``run_job``'s is_committed extractor-version check.

    Cross-partition semantics: merge-by-``key_col`` makes the table
    exactly-once per url GLOBALLY (latest partition wins), not just per
    partition — stronger than ``run_job``'s per-partition dedup, and
    each pre-merge snapshot stays time-travelable. Bloom sidecars ride
    every commit because url keys are hash-distributed (range stats
    alone would rewrite the whole table every partition).

    Returns the standard per-partition counters report."""
    # validate the release-tag NAME before any work: a bad name must
    # fail in milliseconds, not after a multi-hour corpus commits
    if tag is not None:
        from .tablelog import _tag_path

        _tag_path(table_dir, tag)
    import hashlib

    from ..state.checkpoint import EXTRACTOR_VERSION
    from .tablelog import (
        _head_version,
        _read_manifest,
        table_append,
        table_create,
        table_history,
        table_merge,
        table_notes,
    )

    if not shard_files:
        raise ValueError("no input shards: shard_files is empty")
    if _head_version(table_dir) < 0:
        table_create(table_dir)
    # notes survive table_expire; manifests may not — counters for
    # expired-but-noted partitions degrade to a bare row, never a rerun
    done = table_notes(table_dir)
    committed_meta: dict = {}
    hist = table_history(table_dir)
    for _, h_row in hist.iterrows():
        n = h_row.get("note")
        if isinstance(n, str) and n.startswith("job-part:"):
            m = _read_manifest(table_dir, int(h_row["version"]))
            committed_meta[n] = m.get("meta") or {}
    if shards_per_partition is None:
        # resume rule identical to run_job's manifest mode: the sizing
        # recorded by the committed job WINS over auto — partition
        # boundaries must be identical across runs or pids would not
        # line up with committed lineage (an auto recompute on a
        # different-sized cluster would shift every shard hash and make
        # the job permanently unresumable). Read it from the NOTE
        # stamps first (they survive retention GC via _notes_expired —
        # manifest meta does not), manifest meta as the fallback for
        # pre-s-field notes.
        sizes = {
            int(n.split(":")[4][1:])
            for n in done
            if isinstance(n, str)
            and n.startswith("job-part:")
            and len(n.split(":")) > 4
        } or {
            m["shards_per_partition"]
            for m in committed_meta.values()
            if m.get("shards_per_partition")
        }
        if sizes:
            shards_per_partition = sizes.pop()
        else:
            shards_per_partition = _auto_shards_per_partition(shard_files)
    partitions = [
        shard_files[i : i + shards_per_partition]
        for i in range(0, len(shard_files), shards_per_partition)
    ]
    seen_pids: dict = {}  # pid -> {hash: {versions}}
    for n in done:
        if isinstance(n, str) and n.startswith("job-part:"):
            parts = n.split(":")
            pid_i, hh_s = int(parts[1]), parts[2]
            ver = parts[3][1:] if len(parts) > 3 else ""  # pre-version notes
            seen_pids.setdefault(pid_i, {}).setdefault(hh_s, set()).add(ver)
    results: dict = {}
    commits = _CommitOverlap("table commit")

    for pid, shards in enumerate(partitions):
        hh = hashlib.sha1("\x00".join(map(str, shards)).encode()).hexdigest()[:12]
        note = (
            f"job-part:{pid}:{hh}:v{EXTRACTOR_VERSION}:s{shards_per_partition}"
        )
        prior = seen_pids.get(pid)
        if prior is not None:
            if hh not in prior:
                raise ValueError(
                    f"partition {pid} was committed from a different shard "
                    f"list (note hashes {sorted(prior)} != {hh}); "
                    "shards_per_partition changed? use the original sizing "
                    "or a fresh table"
                )
            if EXTRACTOR_VERSION in prior[hh]:
                meta = committed_meta.get(note, {})
                # manifest expired by retention GC -> full zero-counter
                # row (counters_report needs every counter column; a
                # bare dict would KeyError the report when ALL rows
                # degrade)
                from ..schemas import COUNTERS_SCHEMA

                zero = {f.name: 0 for f in COUNTERS_SCHEMA}
                results[pid] = {
                    **zero,
                    **(meta.get("counters") or {}),
                    "partition_id": pid,
                }
                continue
            # same shards, older extractor version: fall through and
            # re-extract — the merge below supersedes the stale rows
        if fail_at_partition is not None and pid >= fail_at_partition:
            commits.join_all()  # earlier commits land; THIS one does not
            raise RuntimeError(f"fault injection: killed before partition {pid}")
        extracted = extract_files(
            shards, batch_size=batch_size, dedup=True
        ).materialize()  # pin: counters + stage both read the same blocks

        def commit_one(pid=pid, shards=shards, note=note, extracted=extracted):
            counters = aggregate_counters(extracted, pid)
            meta = {
                "counters": counters,
                "input_shards": list(map(str, shards)),
                "shards_per_partition": shards_per_partition,
                "extractor_version": EXTRACTOR_VERSION,
            }
            if _head_version(table_dir) == 0:
                table_append(
                    table_dir, extracted, stats_cols=[key_col], note=note,
                    bloom_key=key_col, meta=meta,
                )
            else:
                table_merge(
                    table_dir, extracted, key_col, stats_cols=[key_col],
                    note=note, bloom_key=key_col, meta=meta,
                )
            results[pid] = counters

        # counters + bloom build + stage + commit run OVERLAPPED with the
        # next partition's extraction (one deep — the same shape as
        # run_job's verify_and_commit thread; measured ~10% of soak wall
        # serialized otherwise, BASELINE.md round 5). The PREVIOUS
        # committer is drained BEFORE this one starts — the overlap is
        # commit N under extraction N+1, never two committers at once,
        # so the head==0 append-vs-merge decision inside the thread is
        # race-free (two live committers could both see head 0 and both
        # APPEND, silently dropping the cross-partition url merge).
        commits.drain(0)
        if commits.errors:
            commits.join_all()
        commits.submit(pid, commit_one)
    commits.join_all()
    if tag is not None:
        # release stamping: pin the COMPLETED run's table version as a
        # named snapshot (survives retention GC; `read_table_at(tag=)`
        # is then "the exact corpus this run produced"). force=True:
        # re-running the job under the same release name re-points the
        # tag to the rerun's head, matching the job's own idempotent
        # resume semantics.
        from .tablelog import table_tag

        table_tag(table_dir, tag, force=True)
    return counters_report([results[pid] for pid in sorted(results)])


def run_job(
    shard_files: list,
    out_dir: str,
    *,
    shards_per_partition: int | None = 4,
    batch_size: int = 256,
    concurrency=None,
    giant_threshold: int | None = None,
    fail_at_partition: int | None = None,
    overlap_commit: bool = True,
    table_dir: str | None = None,
    tag: str | None = None,
) -> pd.DataFrame:
    """Resumable extraction job over Parquet shards.

    Default extraction shape (round 4): the FUSED single-pool path
    (``extract_files`` — parquet decode inside the extract task, html
    never enters the object store; measured 3.4× the dual-pool soak at
    the 96k/32-shard config, 4474 vs 1309 docs/s). Giant documents run
    as longer tasks that the scheduler interleaves — no pool-level
    head-of-line blocking — so the dedicated giant pool is opt-in via
    an explicit ``giant_threshold`` (bytes) for corpora whose heavy
    tail needs separate sizing; committed-output parity between both
    shapes is pinned in ``test_run_job_fused_single_pool_parity``.

    Partition = a contiguous group of input shards; each partition is
    extracted, written under ``out_dir/part-{pid:05d}/``, then committed
    via an atomic manifest (lineage: shard list + counters). On re-run,
    committed partitions (same extractor version) are SKIPPED and
    partial uncommitted output is deleted first — exactly-once output.

    ``fail_at_partition`` is the fault-injection hook for the
    kill-and-resume test (FIXTURES.md §5).

    Scale note: partitions are sized (shards_per_partition) so one
    partition saturates the cluster under streaming execution; the
    driver loop adds one manifest fsync per partition, not per row.
    The write-verify + counters + manifest commit of partition N runs
    in a background thread OVERLAPPED with partition N+1's extraction
    (the commit barrier serialized the whole job otherwise — measured
    ~40% of soak wall time in round 1). Commits are per-partition
    manifests, so out-of-order completion is resume-safe: a crash
    re-runs exactly the uncommitted partitions.
    ``overlap_commit=False`` forces the round-1 sequential barrier
    (each partition fully verifies + commits before the next starts) —
    the control arm for measuring the overlap win.

    ``shards_per_partition=None`` auto-sizes partitions from parquet
    footers + cluster CPUs (``_auto_shards_per_partition``). On a
    resume, the sizing recorded in the existing manifests WINS over
    auto — partition boundaries must be identical across runs or
    partition ids would not line up with the committed lineage.
    ``table_dir`` switches the commit target to the versioned table log
    (``run_job_versioned``): each partition publishes as one atomic
    table version with time travel / CDC / compaction for free, and
    ``out_dir`` is ignored. Returns the per-partition counters report.
    """
    if tag is not None and table_dir is None:
        raise ValueError(
            "run_job(tag=...) requires table_dir= — release tags pin a "
            "versioned-table snapshot; manifest mode has no versions to pin"
        )
    if table_dir is not None:
        # reject, don't silently drop: the versioned job is the fused
        # single-pool always-overlapped shape — a caller passing
        # giant-pool sizing, explicit concurrency, or a serialization
        # request would otherwise only notice in production (the CLI
        # repeats this check for its own friendlier message)
        dropped = [
            name
            for name, bad in (
                ("giant_threshold", giant_threshold is not None),
                ("concurrency", concurrency is not None),
                ("overlap_commit=False", overlap_commit is False),
            )
            if bad
        ]
        if dropped:
            raise ValueError(
                f"run_job(table_dir=...) does not support {', '.join(dropped)}: "
                "the versioned job is the fused single-pool shape with "
                "one-deep commit overlap; use manifest mode (out_dir) "
                "for those knobs"
            )
        return run_job_versioned(
            shard_files,
            table_dir,
            shards_per_partition=shards_per_partition,
            batch_size=batch_size,
            fail_at_partition=fail_at_partition,
            tag=tag,
        )
    committed = {m["partition_id"]: m for m in checkpoint.load_manifests(out_dir)}
    if shards_per_partition is None:
        if committed:
            # every manifest records the JOB's sizing explicitly (any
            # one suffices — including a short tail partition that
            # happened to commit first under out-of-order overlap);
            # pre-round-2 manifests lack the field, where max over
            # shard-list lengths recovers it unless only the tail
            # committed (then the lineage guard below fails loudly)
            sizes = {
                m["shards_per_partition"]
                for m in committed.values()
                if "shards_per_partition" in m
            }
            if sizes:
                shards_per_partition = sizes.pop()
            else:
                shards_per_partition = max(
                    len(m.get("input_shards") or []) for m in committed.values()
                ) or 4
        else:
            shards_per_partition = _auto_shards_per_partition(shard_files)
    partitions = [
        shard_files[i : i + shards_per_partition]
        for i in range(0, len(shard_files), shards_per_partition)
    ]
    # lineage guard: a committed manifest whose shard list does not
    # match this run's partitioning means the caller re-sized or
    # re-ordered the input — skipping by pid would silently mis-attach
    # output to the wrong shards. Fail loudly instead.
    for pid, m in committed.items():
        want = m.get("input_shards")
        if want and pid < len(partitions) and list(want) != list(partitions[pid]):
            raise ValueError(
                f"partition {pid} manifest lineage does not match this "
                f"run's partitioning (shards_per_partition changed?); "
                f"use the original sizing or a fresh out_dir"
            )
    results: dict = {}
    commits = _CommitOverlap("verify/commit")

    def verify_and_commit(pid: int, shards: list, pdir: str) -> None:
        # retry ladder (mirrors the reference's write-verify sink,
        # src/clipboard.py:20-44): TRANSIENT failures — fs hiccups
        # surfacing as OSError/IOError anywhere in read-back, counter
        # aggregation, or manifest write — retry 3× with increasing
        # backoff; anything else (bad data, schema drift, logic errors)
        # fails fast (raises to the _CommitOverlap wrapper). The whole
        # attempt is idempotent: read-back is pure, and
        # commit_partition writes the manifest atomically
        # (tmp+fsync+rename), so a retry after a partially-failed
        # attempt cannot double-commit or corrupt lineage — exactly-once
        # is preserved because the manifest either exists (done) or not.
        import time as _time

        last_exc: BaseException | None = None
        for attempt in range(3):
            try:
                _ensure_partition_dir(pdir)
                written = read_pages(pdir)  # write-verify (read-back idiom S3)
                counters = aggregate_counters(written, pid)
                checkpoint.commit_partition(
                    out_dir, pid, input_shards=shards, row_range=None,
                    counters=counters, job_sizing=shards_per_partition,
                )
                results[pid] = counters
                return
            except (OSError, IOError) as exc:  # transient: retry w/ backoff
                last_exc = exc
                print(
                    f"partition {pid} verify/commit attempt {attempt + 1} "
                    f"failed ({type(exc).__name__}: {exc}); retrying"
                )
                _time.sleep(0.3 * (attempt + 1))
        raise last_exc  # type: ignore[misc]

    for pid, shards in enumerate(partitions):
        if checkpoint.is_committed(out_dir, pid):
            results[pid] = {"partition_id": pid, **committed[pid]["counters"]}
            continue
        if fail_at_partition is not None and pid >= fail_at_partition:
            commits.join_all()  # earlier commits land; THIS one does not
            raise RuntimeError(f"fault injection: killed before partition {pid}")
        checkpoint.clean_uncommitted(out_dir, pid)
        if giant_threshold is None and concurrency is None:
            # single-pool shape: take the fused read+extract (decode
            # inside the extract task — html never enters the object
            # store; byte-parity pinned in test_pipeline_e2e). URI
            # shards included: each task opens its own stream through
            # sources.open_shard, so object-store inputs keep the
            # fused data motion (VERDICT r4 rank-1).
            extracted = extract_files(shards, batch_size=batch_size, dedup=True)
        else:
            ds = read_pages(shards)
            extracted = extract_dataset(
                ds,
                batch_size=batch_size,
                concurrency=concurrency,
                giant_threshold=giant_threshold,
                dedup=True,
            )
        pdir = checkpoint.partition_dir(out_dir, pid)
        extracted.write_parquet(pdir)
        # commit barrier off the critical path: next partition's read +
        # extract starts while this one verifies and commits
        commits.submit(
            pid, lambda pid=pid, shards=shards, pdir=pdir: verify_and_commit(
                pid, shards, pdir
            )
        )
        # bound the verify backlog: at most 2 in flight, so a slow
        # verify applies backpressure instead of piling up read jobs
        commits.drain(2 if overlap_commit else 0)
        if commits.errors:
            commits.join_all()
    commits.join_all()
    report = counters_report([results[pid] for pid in sorted(results)])
    # S6 metrics sink: the counters table rides next to the manifests
    # (reference update-track event sink, update_routes.py:287-313)
    if len(report):
        import os

        import pyarrow.parquet as pq

        from ..schemas import COUNTERS_SCHEMA

        from ..state.checkpoint import fs_makedirs

        metrics_dir = os.path.join(out_dir, "_metrics")
        fs_makedirs(metrics_dir)
        pq.write_table(
            pa.Table.from_pandas(
                report[[f.name for f in COUNTERS_SCHEMA]], preserve_index=False
            ).cast(COUNTERS_SCHEMA),
            os.path.join(metrics_dir, "counters.parquet"),
        )
    return report


# --- SQL-checkable extraction queries over the documents table ---------------

def _documents_as_pages(sf_dir: str):
    """documents → synthetic boilerplate-laden pages (deterministic;
    main content == document text, so extraction is SQL-checkable)."""
    from ..datagen import documents_to_pages
    from ..sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(documents_to_pages, batch_format="pyarrow")


def extract_documents(sf_dir: str):
    """Flagship extraction over pages synthesized from documents:
    read → annotate → actor-pool extract. The DuckDB oracle asserts
    extracted_text == the original document text, byte-for-byte —
    the north_rule invariant expressed as SQL."""
    extracted = extract_dataset(_documents_as_pages(sf_dir), dedup=False)
    df = extracted.to_pandas()[["url", "extracted_text", "status"]]
    return df.sort_values("url").reset_index(drop=True)


def extract_localized(sf_dir: str):
    """Extraction with per-language model dispatch: each row routes to
    the language model keyed by its ``lang`` column (models compiled
    once per actor — SURVEY §7 step 5, reference src/ocr.py:196-204).
    Output is SQL-checkable: extracted_text == documents.text plus the
    per-lang stopword-model counts."""
    from ..stages.extract import LangDispatchExtract, _auto_pools

    small, giant = _auto_pools()
    out = _documents_as_pages(sf_dir).map_batches(
        LangDispatchExtract,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=128,
        concurrency=small + giant,
    )
    df = out.to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def extract_pdf_documents(sf_dir: str):
    """PDF-arm of the flagship extraction: documents -> real
    deterministic PDFs -> the PdfExtract actor pool (strict: any parse
    failure raises instead of hiding in a status row). The DuckDB
    oracle asserts extracted_text == the original document text —
    the north_rule's "PDF/layout parse" requirement, SQL-checked."""
    from ..datagen import documents_to_pdf_pages
    from ..sources import read_table
    from ..stages.extract import PdfExtract, _auto_pools

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(documents_to_pdf_pages, batch_format="pyarrow")
    small, giant = _auto_pools()
    extracted = pages.map_batches(
        PdfExtract,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=small + giant,
        fn_constructor_kwargs={"strict": True},
    )
    df = extracted.to_pandas()[["url", "extracted_text", "status"]]
    return df.sort_values("url").reset_index(drop=True)


def extract_spans(sf_dir: str):
    """Span offsets of the extraction (first/only span per synthesized
    page): start, end in characters of the extracted text."""
    extracted = extract_dataset(_documents_as_pages(sf_dir), dedup=False)

    def flatten(batch: pa.Table) -> pa.Table:
        # vectorized 1->N explode: list_flatten yields every span struct,
        # list_parent_indices maps each back to its row's url — the same
        # Arrow idiom paragraph_dedup uses; no Python row loop.
        spans = batch["spans"]
        structs = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        return pa.table(
            {
                "url": pc.take(batch["url"], parents),
                "span_start": pc.cast(pc.struct_field(structs, "start"), pa.int64()),
                "span_end": pc.cast(pc.struct_field(structs, "end"), pa.int64()),
                "span_kind": pc.cast(pc.struct_field(structs, "kind"), pa.string()),
            }
        )

    out = extracted.map_batches(flatten, batch_format="pyarrow")
    return out.to_pandas().sort_values("url").reset_index(drop=True)


# --- url-hash input layout (the 100-TB dedup answer) -------------------------

def partition_pages_by_url(shard_files: list, out_dir: str, *, num_buckets: int = 16):
    """One-time layout pass: rewrite pages shards into url-hash buckets
    (``bucket-{b:05d}.parquet``), the crawl-store layout the north_rule
    assumes ("repartition by url-hash").

    After this pass every occurrence of a url lives in exactly one
    bucket, so ``run_job_partitioned`` can dedup LOCALLY per partition
    and still be globally exact — extraction output never needs a
    corpus-wide shuffle. The layout shuffle itself moves raw pages
    once; at 100 TB it is amortized across every downstream run (and
    is exactly the shuffle a crawl ingest already performs).
    """
    import os

    from ..functions.scalar import stable_bucket

    os.makedirs(out_dir, exist_ok=True)
    ds = read_pages(shard_files)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["url"], num_buckets)
        return batch.append_column("url_bucket", pa.array(b, pa.int32()))

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        bid = group["url_bucket"][0].as_py()
        table = group.drop_columns(["url_bucket"])
        # deterministic row order within the bucket (url is unique per
        # row up to exact duplicates; warc_ts tie-breaks)
        import pyarrow.compute as pc

        order = pc.sort_indices(
            table, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        pq.write_table(
            table.take(order),
            os.path.join(out_dir, f"bucket-{bid:05d}.parquet"),
            compression="zstd",
        )
        return pa.table({"bucket": pa.array([bid], pa.int32()),
                         "rows": pa.array([table.num_rows], pa.int64())})

    stats = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("url_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    ), stats


def run_job_partitioned(
    bucket_files: list,
    out_dir: str,
    *,
    batch_size: int = 64,
    giant_threshold: int | None = 4 * 1024 * 1024,
) -> pd.DataFrame:
    """Resumable extraction over a url-hash-partitioned layout
    (one bucket file per partition): dedup happens inside each
    partition only, which the layout makes globally exact. This is the
    configuration that holds at 10^12 documents — no corpus-wide
    all-to-all at extraction time."""
    return run_job(
        bucket_files,
        out_dir,
        shards_per_partition=1,
        batch_size=batch_size,
        giant_threshold=giant_threshold,
    )
