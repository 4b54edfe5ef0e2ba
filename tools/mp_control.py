"""Pure-multiprocessing scaling control: same parser, same corpus, NO
Ray — the hardware ceiling for `bench.py --scaling`'s efficiency
number. If this control scales ~1.0 from N to 4N procs, any deficit in
the Ray number is engine data motion, not the box (the round-4 finding:
pre-fusion 0.755 vs mp 1.07 exposed the ReadParquet plasma round-trip).

    python tools/mp_control.py <corpus_dir> 4
    python tools/mp_control.py <corpus_dir> 16

Each worker reads one parquet shard (url+html only) and runs the
single-process oracle per document — read+parse, no object store, no
dedup/write, so the number bounds the parse+decode path only.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(path: str) -> int:
    import pyarrow.parquet as pq

    from textextract_ray.oracle import extract_document

    t = pq.read_table(path, columns=["url", "html"])
    n = 0
    for h in t["html"].to_pylist():
        extract_document(h)
        n += 1
    return n


def main() -> None:
    corpus, nproc = sys.argv[1], int(sys.argv[2])
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    if not files:
        raise SystemExit(f"no parquet shards under {corpus}")
    t0 = time.perf_counter()
    with mp.Pool(nproc) as pool:
        total = sum(pool.map(work, files, chunksize=1))
    dt = time.perf_counter() - t0
    print(f"{nproc} procs: {total} docs in {dt:.2f}s = {total / dt:.1f} docs/s")


if __name__ == "__main__":
    main()
