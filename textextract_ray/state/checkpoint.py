"""Per-partition checkpoint manifests: lineage + counters + atomic commit.

Rebuilds the reference's exactly-once idioms as a partition-commit
protocol (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

  * write-temp-then-rename atomic commit — the installer-download idiom
    (reference src/updater.py:548,667-679: stream to ``.downloading``,
    rename on complete);
  * manifest-presence == committed — the single-instance-lock /
    cache-file-fallback pattern (reference src/main.py:100-109,
    update_routes.py:103-133);
  * extractor-version check on resume — the version tuple-compare
    (reference update_routes.py:167-183): a manifest written by a
    different extractor version is NOT reused.

Layout under ``out_dir``:
    part-{pid:05d}/ *.parquet          (data, only after commit)
    _manifests/part-{pid:05d}.json     (lineage + counters)

``out_dir`` may be a plain local path or a URI (``file://...``, any
fsspec-resolvable scheme): URI paths route through fsspec, plain paths
keep the exact local semantics (fsync + atomic os.rename). On object
stores without atomic rename the tmp+mv commit degrades to
copy-then-delete — manifest-PRESENCE remains the commit marker either
way, which is the property resume correctness actually relies on.
"""

from __future__ import annotations

import json
import os
import shutil

from .. import EXTRACTOR_VERSION


def _fs_for(path: str):
    """fsspec-resolve a possibly-URI path: '://' in the path → (fs,
    stripped path); plain local paths → (None, path) so the os fast
    path and its exact semantics are untouched."""
    s = str(path)
    if "://" in s:
        import fsspec

        return fsspec.core.url_to_fs(s)
    return None, s


def fs_exists(path: str) -> bool:
    fs, p = _fs_for(path)
    return fs.exists(p) if fs else os.path.exists(p)


def fs_isdir(path: str) -> bool:
    fs, p = _fs_for(path)
    return fs.isdir(p) if fs else os.path.isdir(p)


def fs_listdir(path: str) -> list:
    """Basenames of directory entries (sorted)."""
    fs, p = _fs_for(path)
    if fs:
        return sorted(e.rstrip("/").rsplit("/", 1)[-1] for e in fs.ls(p))
    return sorted(os.listdir(p))


def fs_makedirs(path: str) -> None:
    fs, p = _fs_for(path)
    if fs:
        fs.makedirs(p, exist_ok=True)
    else:
        os.makedirs(p, exist_ok=True)


def fs_open(path: str, mode: str = "r"):
    fs, p = _fs_for(path)
    return fs.open(p, mode) if fs else open(p, mode)


def fs_rmtree(path: str) -> None:
    fs, p = _fs_for(path)
    if fs:
        fs.rm(p, recursive=True)
    else:
        shutil.rmtree(p)


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")


def partition_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}")


def is_committed(out_dir: str, pid: int, *, extractor_version: str = EXTRACTOR_VERSION) -> bool:
    """Committed iff the manifest exists AND was written by the same
    extractor version; stale-version manifests force a re-run."""
    path = manifest_path(out_dir, pid)
    if not fs_exists(path):
        return False
    try:
        with fs_open(path) as f:
            m = json.load(f)
        return m.get("extractor_version") == extractor_version
    except (json.JSONDecodeError, OSError):
        return False


def clean_uncommitted(out_dir: str, pid: int) -> None:
    """Partial output without a manifest is deleted before re-run
    (consume-once semantics, D1/D3)."""
    pdir = partition_dir(out_dir, pid)
    if fs_exists(pdir) and not is_committed(out_dir, pid):
        fs_rmtree(pdir)


def commit_partition(
    out_dir: str,
    pid: int,
    *,
    input_shards: list,
    row_range: tuple | None,
    counters: dict,
    extractor_version: str = EXTRACTOR_VERSION,
    job_sizing: int | None = None,
) -> dict:
    """Atomically write the manifest (tmp + rename). The data directory
    must already be fully written; the rename is the commit point."""
    manifest = {
        "partition_id": pid,
        "input_shards": list(input_shards),
        "row_range": list(row_range) if row_range else None,
        "extractor_version": extractor_version,
        "counters": counters,
    }
    # the JOB's shards_per_partition (not this partition's shard count
    # — the tail partition is short): lets an auto-sized resume recover
    # the exact original partitioning from ANY single manifest
    if job_sizing is not None:
        manifest["shards_per_partition"] = int(job_sizing)
    fs_makedirs(os.path.join(out_dir, "_manifests"))
    final = manifest_path(out_dir, pid)
    tmp = final + ".tmp"
    fs, tmp_p = _fs_for(tmp)
    if fs:
        with fs.open(tmp_p, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        _, final_p = _fs_for(final)
        fs.mv(tmp_p, final_p)
    else:
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
    return manifest


def load_manifests(out_dir: str) -> list:
    mdir = os.path.join(out_dir, "_manifests")
    if not fs_isdir(mdir):
        return []
    out = []
    for name in fs_listdir(mdir):
        if name.endswith(".json"):
            with fs_open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
