"""CLI entry point — the ``ray job submit`` surface.

    python -m textextract_ray extract --input '/data/pages' --out /tmp/out \
        [--shards-per-partition 4|0=auto] [--giant-threshold 0=fused-single-pool] [--resume]
    python -m textextract_ray report --out /tmp/out
    python -m textextract_ray query --name q1_pricing_summary --sf-dir /root/testdata/sf0.01

Owns the Ray session (init guarded, shutdown at exit) — library code
never does (driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        # respect RAY_ADDRESS (set by `ray job submit` on a cluster);
        # fall back to a local instance for standalone runs
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if address == "local":
            kwargs["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        ray.init(address=address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_extract(args) -> int:
    from .pipelines.extract_pipeline import run_job

    files = sorted(glob.glob(args.input)) if any(c in args.input for c in "*?[") else None
    if files is None:
        files = (
            sorted(
                os.path.join(args.input, f)
                for f in os.listdir(args.input)
                if f.endswith(".parquet")
            )
            if os.path.isdir(args.input)
            else [args.input]
        )
    if not files:
        print(f"error: no parquet shards under {args.input!r}", file=sys.stderr)
        return 2
    if not args.resume and os.path.exists(os.path.join(args.out, "_manifests")):
        print(
            f"error: {args.out} already has manifests; pass --resume to continue it",
            file=sys.stderr,
        )
        return 2
    _init_ray()
    report = run_job(
        files,
        args.out,
        shards_per_partition=args.shards_per_partition or None,
        giant_threshold=args.giant_threshold if args.giant_threshold > 0 else None,
    )
    print(report.to_string(index=False))
    return 0


def cmd_report(args) -> int:
    from .state.checkpoint import load_manifests

    manifests = load_manifests(args.out)
    if not manifests:
        print(f"error: no manifests under {args.out}", file=sys.stderr)
        return 2
    print(json.dumps(manifests, indent=2))
    return 0


def cmd_query(args) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as em

    qs = em.queries()
    if args.name not in qs:
        print(
            f"error: unknown query {args.name!r}; available: {', '.join(sorted(qs))}",
            file=sys.stderr,
        )
        return 2
    _init_ray()
    res = qs[args.name](args.sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    print(res.to_string(index=False))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="textextract_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="resumable extraction job over parquet shards")
    pe.add_argument("--input", required=True, help="shard glob, directory, or file")
    pe.add_argument("--out", required=True)
    pe.add_argument(
        "--shards-per-partition",
        type=int,
        default=4,
        help="shards per committed partition; 0 = auto-size from "
        "parquet footers + cluster CPUs (resume keeps the original "
        "sizing recorded in the manifests)",
    )
    pe.add_argument(
        "--giant-threshold",
        type=int,
        default=0,
        help="route docs larger than this many bytes to the dedicated "
        "small-batch giant pool (opt-in); 0 (default) = the fused "
        "single-pool shape, matching run_job's library default",
    )
    pe.add_argument("--resume", action="store_true")
    pe.set_defaults(fn=cmd_extract)

    pr = sub.add_parser("report", help="print committed partition manifests")
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_report)

    pq = sub.add_parser("query", help="run a named query from __ray_entry__")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
