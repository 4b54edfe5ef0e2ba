"""Generate the golden-fixture oracles for the sketch-based queries.

For each golden query (see __ray_entry__._GOLDEN_QUERIES) this runs the
Ray pipeline at every testdata scale factor, tags each result with the
sf (events row count — unique per sf dir where documents count is not),
and writes one parquet per query under fixtures/golden/.

The fixtures pin CROSS-RUN DETERMINISM under the driver gate; they are
not an independent correctness proof — semantic correctness (planted
duplicates found, IVF recall vs brute force, HLL error bound) is pinned
by pytest (tests/test_dedup.py, test_similarity.py, test_functions.py).
Regenerate after any intentional algorithm change:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # fixture name -> (source query, column subset | None). Most
    # fixtures are a query's full output; two are column slices of
    # consolidated queries whose OTHER columns are exact SQL (the
    # hybrid oracles join these fixtures back in).
    sources = {name: (name, None) for name in entrymod._GOLDEN_QUERIES}
    sources["rolling_fingerprints"] = ("fingerprints", ["doc_id", "rolling_fp"])
    sources["host_heavy_hitters"] = ("host_heavy_hitters", ["host", "est_count"])
    sources["approx_quantiles"] = (
        "approx_quantiles",
        ["event_type", "q25", "q50", "q75", "q95"],
    )
    out_dir = "/root/repo/fixtures/golden"
    os.makedirs(out_dir, exist_ok=True)

    for name, (src, cols) in sources.items():
        parts = []
        for sf_dir in SF_DIRS:
            tag = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows
            res = qs[src](sf_dir)
            if not isinstance(res, pd.DataFrame):
                res = res.to_pandas()
            res = res[cols].copy() if cols else res.copy()
            res["sf_tag"] = pd.Series([tag] * len(res), dtype="int64")
            parts.append(res)
            print(f"{name} @ {sf_dir}: {len(res)} rows (tag {tag})")
        all_df = pd.concat(parts, ignore_index=True)
        path = os.path.join(out_dir, f"{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(all_df, preserve_index=False), tmp)
        os.replace(tmp, path)
        print(f"wrote {path}: {len(all_df)} rows")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
