"""The extraction stage: an actor-pool ``map_batches`` over Arrow.

Rebuild of the reference's hot path (backend/routes/api_routes.py:19-152):
per-document extract + per-request provenance (timing, request/response
sizes, status, error) — but batched, zero-copy, and stateful-per-actor
instead of request/response. The callable CLASS pattern means parser
state (compiled token tables, per-language hooks — the analogue of the
module-level Together client at api_routes.py:16-17 and the singleton
session at src/ocr.py:22-41) is built ONCE per actor in ``__init__``
and amortized across every batch the actor processes.

Per-document work is inherently row-wise (each doc is its own parse),
so the "vectorization unit" is the document; the batch loop carries no
per-row Arrow overhead because html bytes are materialized once via
``to_pylist`` on the zero-copy batch.
"""

from __future__ import annotations

import time

import pyarrow as pa

from .. import EXTRACTOR_VERSION
from ..oracle import DEFAULT_MAX_OUTPUT_BYTES, extract_document
from ..schemas import EXTRACTED_SCHEMA

_SPAN_TYPE = EXTRACTED_SCHEMA.field("spans").type


class ExtractBatch:
    """Actor-pool extraction stage.

    Use:
        ds.map_batches(ExtractBatch, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=256,
                       concurrency=(2, 8), num_cpus=1,
                       fn_constructor_kwargs={"max_output_bytes": ...})
    """

    def __init__(self, max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES):
        # Stateful setup happens here, once per actor: at present the
        # HTML oracle's state is module-level compiled regexes; future
        # per-language models / PDF parser handles land here too.
        self.max_output_bytes = max_output_bytes
        self.version = EXTRACTOR_VERSION

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        n = len(urls)
        texts, spans, statuses, errors = [], [], [], []
        times_ms, req_sizes, resp_sizes = [], [], []
        for html in htmls:
            t0 = time.perf_counter()
            res = extract_document(html, self.max_output_bytes)
            dt_ms = int((time.perf_counter() - t0) * 1000)
            texts.append(res.text)
            spans.append(res.spans)
            statuses.append(res.status)
            errors.append(res.error)
            times_ms.append(dt_ms)
            req_sizes.append(len(html) if html is not None else 0)
            resp_sizes.append(len(res.text.encode("utf-8")))
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(texts, pa.large_string()),
                pa.array(spans, _SPAN_TYPE),
                pa.array(statuses, pa.string()),
                pa.array(errors, pa.string()),
                pa.array(times_ms, pa.int64()),
                pa.array(req_sizes, pa.int64()),
                pa.array(resp_sizes, pa.int64()),
                pa.array([self.version] * n, pa.string()),
            ],
            schema=EXTRACTED_SCHEMA,
        )


def _auto_pools() -> tuple:
    """Size the two extraction pools from the cluster CPU budget:
    ~5/8 of CPUs to the small-doc pool, ~1/4 to the giant-doc pool,
    the rest left for read/write tasks. Fixed-size pools (ints) start
    every actor immediately — an autoscaling pool ramps too slowly for
    a batch job, and two fixed pools must never sum past the CPU
    budget or the second pool deadlocks waiting for actors."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    small = max(2, (ncpu * 5) // 8)
    giant = max(1, ncpu // 4)
    return small, giant


def extract_pages(
    pages_ds,
    *,
    batch_size: int = 256,
    concurrency=None,
    num_cpus: float = 1,
    giant_threshold: int | None = None,
    max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES,
):
    """pages Dataset -> extracted Dataset (EXTRACTED_SCHEMA).

    With ``giant_threshold`` set, rows whose ``html_size`` exceeds it
    are routed to a second pool with batch_size=4 (skew-aware: one
    20 MB doc shouldn't ride in a 256-row batch next to 2 KB docs —
    the north_rule's "skew-aware block splitting"). Requires the
    validate.annotate_batch stage upstream for ``html_size``.

    ``concurrency=None`` auto-sizes both pools from the cluster CPUs.
    """
    auto_small, auto_giant = _auto_pools()
    common = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=num_cpus,
        fn_constructor_kwargs={"max_output_bytes": max_output_bytes},
    )
    if giant_threshold is None:
        return pages_ds.map_batches(
            ExtractBatch,
            batch_size=batch_size,
            concurrency=concurrency or (auto_small + auto_giant),
            **common,
        )
    from .validate import split_by_size

    small, giant = split_by_size(pages_ds, giant_threshold)
    small_out = small.map_batches(
        ExtractBatch,
        batch_size=batch_size,
        concurrency=concurrency or auto_small,
        **common,
    )
    # the giant pool runs a real share of the cluster (a heavy-tailed
    # corpus can be mostly-giant by bytes; an undersized giant pool
    # serializes the whole pipeline) with a tiny batch_size so one
    # batch never holds more than a few multi-MB payloads
    giant_out = giant.map_batches(
        ExtractBatch,
        batch_size=4,
        concurrency=concurrency or auto_giant,
        **common,
    )
    return small_out.union(giant_out)
