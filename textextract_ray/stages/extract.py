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

# Transient-vs-poison failure classification (SURVEY §4.2; reference
# retry ladders src/ocr.py:207-259, src/updater.py:105-120): I/O-shaped
# exceptions are retried in place by Ray's task layer — the batch
# re-runs on the (already-warm) actor (Ray Data actor pools default to
# max_restarts=-1 / max_task_retries=-1, so actor deaths already
# recover; DataContext.actor_task_retry_on_errors extends that to
# application-level transient exceptions). Anything NOT in this list
# (a logic bug) fails fast. Poison documents NEVER raise: the
# extractor catches per-document failures and emits a status row
# (see ExtractBatch.__call__), so a malformed input cannot burn
# retries or wedge the pipeline.
TRANSIENT_EXCEPTIONS = (OSError, ConnectionError, TimeoutError)

# Bound for plain-task transient retries: Ray Data's task operators
# default to max_retries=-1, so a PERMANENTLY-failing shard (dead
# mirror, deleted object-store key — both surface as OSError, the
# retryable class) would respawn its task forever and wedge the whole
# pipeline on one input. 4 retries absorbs real transience (each http
# attempt already runs a 3x backoff ladder internally = up to 15
# connection attempts total); the 5th failure surfaces the error to
# the driver, where run_job's partition granularity makes the retry
# decision a human/scheduler one. Found the hard way: a round-5 test
# against a dead localhost mirror retried one task 401 times before a
# SIGINT ended the run.
TRANSIENT_MAX_RETRIES = 4


def apply_transient_retry_policy() -> None:
    """Idempotently install the transient-retry classification on the
    current DataContext (picked up by every dataset built after the
    call). Called by the extraction entry points."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    existing = ctx.actor_task_retry_on_errors or []
    if existing is True:
        return
    merged = list(dict.fromkeys([*existing, *TRANSIENT_EXCEPTIONS]))
    ctx.actor_task_retry_on_errors = merged


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


def _clamp_two_pools(c_small, c_giant) -> tuple:
    """Deadlock guard for any two-fixed-pool layout: if the pools
    together would reserve every cluster CPU, the second pool waits
    forever for actors that can never schedule (and the read/write
    tasks starve). Scale both down so at least one CPU stays free.
    Only int (fixed) concurrencies are clamped — autoscaling tuples
    release actors under pressure."""
    import ray

    if not (isinstance(c_small, int) and isinstance(c_giant, int)):
        return c_small, c_giant
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    budget = max(2, ncpu - 1)
    total = c_small + c_giant
    if total <= budget:
        return c_small, c_giant
    scale = budget / total
    return max(1, int(c_small * scale)), max(1, int(c_giant * scale))


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
    apply_transient_retry_policy()
    if giant_threshold is None:
        if concurrency is None:
            # Stateless-task mode (default): the HTML extractor's only
            # per-actor state is a byte limit and a version string —
            # module-level compiled regexes load with the worker
            # process either way — so a constructed INSTANCE runs as
            # plain tasks: no pool spin-up (~1-3 s per invocation), no
            # fixed-pool/read-task CPU contention, scheduler-managed
            # parallelism (measured 16% faster at 16 CPUs). Actor
            # pools remain the shape for stages with REAL state
            # (per-language models, PDF parser handles, host caches):
            # pass an explicit ``concurrency`` to get one here.
            return pages_ds.map_batches(
                ExtractBatch(max_output_bytes=max_output_bytes),
                batch_size=batch_size,
                batch_format="pyarrow",
                zero_copy_batch=True,
                num_cpus=num_cpus,
                # plain tasks don't consume actor_task_retry_on_errors
                # (Ray 2.49 reads it only in the actor-pool operator) —
                # the transient contract rides the remote args instead
                retry_exceptions=list(TRANSIENT_EXCEPTIONS),
                max_retries=TRANSIENT_MAX_RETRIES,
            )
        return pages_ds.map_batches(
            ExtractBatch,
            batch_size=batch_size,
            concurrency=concurrency,
            **common,
        )
    from .validate import split_by_size

    c_small, c_giant = _clamp_two_pools(
        concurrency or auto_small, concurrency or auto_giant
    )
    small, giant = split_by_size(pages_ds, giant_threshold)
    small_out = small.map_batches(
        ExtractBatch, batch_size=batch_size, concurrency=c_small, **common
    )
    # the giant pool runs a real share of the cluster (a heavy-tailed
    # corpus can be mostly-giant by bytes; an undersized giant pool
    # serializes the whole pipeline) with a tiny batch_size so one
    # batch never holds more than a few multi-MB payloads
    giant_out = giant.map_batches(
        ExtractBatch, batch_size=4, concurrency=c_giant, **common
    )
    return small_out.union(giant_out)


# --- groupby-host locality (A3: parser-cache locality) -----------------------

class _HostRules:
    """Stand-in for per-host parser state (the reference's TTL release
    cache A3, update_routes.py:55-60: expensive-to-build, reusable).
    Building is the cacheable unit; here it compiles a host-scoped
    pattern once per host."""

    def __init__(self, host: str):
        import re

        self.host = host
        self.pattern = re.compile(re.escape(host))


def extract_pages_host_locality(
    pages_ds,
    *,
    num_buckets: int = 64,
    max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES,
):
    """Extraction with groupby-host locality (north_star: "groupby-host
    locality for parser cache hits"): pages are shuffled ONCE on
    host-hash buckets so every document of a host lands in the same
    group; inside the group, rows are processed host-ordered with a
    per-host rules cache — state builds once per host instead of once
    per (host, batch) occurrence.

    Costs a full input shuffle; worth it when per-host state is
    expensive (layout templates, per-site models). The default
    ``extract_pages`` path skips the shuffle. Output additionally
    carries ``host_cache_hit`` so the locality win is measurable.
    """
    import pyarrow.compute as pc

    from ..functions.scalar import stable_bucket, url_host

    def bucketize(batch: pa.Table) -> pa.Table:
        hosts = url_host(batch["url"])
        b = stable_bucket(hosts, num_buckets)
        return batch.append_column("host", hosts).append_column(
            "host_bucket", pa.array(b, pa.int32())
        )

    extractor = ExtractBatch(max_output_bytes=max_output_bytes)

    def extract_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("host", "ascending")])
        g = group.take(order)
        out = extractor(g)
        hosts = g["host"].to_pylist()
        cache: dict = {}
        hits = []
        for h in hosts:
            if h in cache:
                hits.append(True)
            else:
                cache[h] = _HostRules(h)
                hits.append(False)
        return out.append_column("host_cache_hit", pa.array(hits, pa.bool_()))

    bucketed = pages_ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("host_bucket").map_groups(
        extract_bucket, batch_format="pyarrow"
    )


# --- per-language extraction models (A1/A2 + the `language` field) -----------

# public basic stopword heads per language; zh has no word boundaries
# (CJK), so its pattern is a bare alternation
_LANG_MODEL_PATTERNS = {
    "en": r"\b(the|and|of|to|in|a|is|that|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|des|du|dans|pour|que)\b",
    "es": r"\b(el|la|los|las|y|es|del|en|que|por)\b",
    "zh": r"(的|了|和|是|在)",
}


class LangDispatchExtract:
    """Actor-pool extraction with PER-LANGUAGE models (the reference's
    ``language`` request field routing to a per-language engine,
    reference src/ocr.py:196-204, backend/routes/api_routes.py:31-40;
    SURVEY §7 step 5).

    All per-language state — one compiled stopword/tokenizer model per
    language — is built ONCE per actor in ``__init__``; ``__call__``
    dispatches each row on its ``lang`` column, extracts main content
    (same byte-identical oracle as ExtractBatch), then applies the
    row's language model. Per-lang work is vectorized per lang-mask,
    not per row. Unknown langs fall back to a null model (0 matches).

    Output: url, lang, extracted_text, n_tokens (\\S+ runs),
    n_stopwords (per-lang model matches on the lowercased text),
    n_kept = n_tokens - n_stopwords clamped at 0.
    """

    def __init__(self, max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES):
        self.max_output_bytes = max_output_bytes
        # the amortized per-actor "model load": the per-lang pattern
        # TABLE (applied via Arrow's RE2 kernel in __call__ — NOT
        # compiled with Python `re`: its Unicode \b semantics differ
        # from RE2's ASCII \b on accented text, and the DuckDB oracle
        # is RE2; keeping one engine keeps the oracle parity exact)
        self.models = dict(_LANG_MODEL_PATTERNS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        texts = [
            extract_document(h, self.max_output_bytes).text
            for h in batch["html"].to_pylist()
        ]
        text_arr = pa.array(texts, pa.large_string())
        n_tokens = pc.count_substring_regex(text_arr, r"\S+").cast(pa.int64())
        lower = pc.utf8_lower(text_arr)
        n_stop = np.zeros(len(texts), dtype=np.int64)
        lang_np = np.asarray(langs, dtype=object)
        for lang in set(langs):
            if lang not in self.models:
                continue  # null model: 0 stopword matches
            idx = np.nonzero(lang_np == lang)[0]
            counts = pc.count_substring_regex(
                lower.take(pa.array(idx)), self.models[lang]
            ).to_numpy(zero_copy_only=False)
            n_stop[idx] = counts  # one regex pass per lang SUBSET, O(n) total
        nt = n_tokens.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "extracted_text": text_arr,
                "n_tokens": n_tokens,
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_kept": pa.array(np.maximum(nt - n_stop, 0), pa.int64()),
            }
        )


# --- PDF / layout-parser actor path (stubbed parser, real routing) -----------

class PdfExtract:
    """Actor-pool stage hosting the stateful PDF/layout parser (the
    north_star's "actor-pool stage hosts stateful PDF/layout parsers").

    The parser is the stdlib-only implementation in
    ``textextract_ray.pdf`` (FlateDecode + content-stream text
    operators — public PDF 1.7 format knowledge, no PDF library
    needed). Parser state (compiled token tables) loads once per actor
    in ``__init__`` and amortizes across batches. Reference contract:
    document bytes in -> text + provenance out (reference
    backend/routes/api_routes.py:78-110).

    ``strict=True`` raises on any row that fails to parse
    (unsupported/ parse_error/invalid) instead of emitting a status
    row — the fail-fast mode for corpora that must be all-PDF.
    """

    def __init__(self, *, strict: bool = False, max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES):
        from ..pdf import extract_pdf  # parser state binds per actor

        self.strict = strict
        self.parser = extract_pdf
        self.max_output_bytes = max_output_bytes
        self.version = EXTRACTOR_VERSION

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        blobs = batch["html"].to_pylist()
        n = len(urls)
        texts, spans, statuses, errors = [], [], [], []
        times_ms, req_sizes, resp_sizes = [], [], []
        for url, blob in zip(urls, blobs):
            t0 = time.perf_counter()
            res = self.parser(blob, self.max_output_bytes)
            dt_ms = int((time.perf_counter() - t0) * 1000)
            if self.strict and res.status not in ("ok", "empty", "truncated"):
                raise ValueError(
                    f"PdfExtract(strict): {url!r} failed to parse: "
                    f"{res.status}: {res.error}"
                )
            texts.append(res.text)
            spans.append(res.spans)
            statuses.append(res.status)
            errors.append(res.error)
            times_ms.append(dt_ms)
            req_sizes.append(len(blob) if blob is not None else 0)
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


def extract_pages_with_pdf_routing(
    pages_ds,
    *,
    batch_size: int = 64,
    concurrency=None,
    max_output_bytes: int = DEFAULT_MAX_OUTPUT_BYTES,
):
    """Split the stream on the PDF magic number: HTML rows go to the
    HTML pool, %PDF- rows to the PdfExtract pool (small batches — real
    layout parsing is memory-heavy). Vectorized prefix test, no Python
    rows; union preserves the per-url output contract."""
    import pyarrow.compute as pc

    apply_transient_retry_policy()
    auto_small, auto_giant = _auto_pools()

    def is_pdf(t: pa.Table):
        # fill_null(False): null html is NOT pdf — it must stay in the
        # html branch (where the extractor flags it invalid), not
        # vanish from both branches via a null mask
        return pc.fill_null(
            pc.equal(
                pc.binary_slice(t["html"], start=0, stop=5),
                pa.scalar(b"%PDF-", pa.binary()),
            ),
            False,
        )

    html_ds = pages_ds.map_batches(
        lambda t: t.filter(pc.invert(is_pdf(t))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pdf_ds = pages_ds.map_batches(
        lambda t: t.filter(is_pdf(t)), batch_format="pyarrow", zero_copy_batch=True
    )
    c_html, c_pdf = _clamp_two_pools(
        concurrency or auto_small, concurrency or auto_giant
    )
    html_out = html_ds.map_batches(
        ExtractBatch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=c_html,
        fn_constructor_kwargs={"max_output_bytes": max_output_bytes},
    )
    pdf_out = pdf_ds.map_batches(
        PdfExtract,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8,
        concurrency=c_pdf,
        fn_constructor_kwargs={"max_output_bytes": max_output_bytes},
    )
    return html_out.union(pdf_out)
