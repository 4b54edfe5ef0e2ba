"""WebDataset-style tar shards for multimodal samples.

The WebDataset convention (public format: POSIX tar archives whose
members share a basename key — ``000123.png`` + ``000123.txt`` +
``000123.json`` form ONE sample; shards are plain ``.tar`` files a
training loader streams sequentially) is the standard interchange for
image/audio+text pairs. This module writes a Dataset of multimodal
rows into that layout and reads it back, using only stdlib ``tarfile``.

Member typing is column-driven: the caller maps columns to extensions
(``{"media": "png", "caption": "txt", "meta": "json"}``); binary
columns write raw bytes, ``txt`` writes utf-8, ``json`` writes
canonical JSON (sorted keys). Sample keys must be dot-free (the
WebDataset sample splitter treats the FIRST dot as the extension
boundary), so integer ids format as zero-padded decimals and dotted
strings are rejected loudly rather than silently corrupting grouping.

Ray-Data shape — the same two bounded steps as the ``.bin``/``.idx``
writer (``binshards.py``): a zero-shuffle shard-tag map + hive parquet
staging, then ONE Ray task per shard that STREAMS the staged row
groups through ``tarfile`` (bounded memory regardless of shard size —
large media payloads never accumulate), commits tmp+fsync+rename
(reference src/updater.py:548,667-679), and records sample counts in
``_tarshards.json``. Within a shard, samples are ordered by key, so
the archive bytes are a pure function of the row multiset
(layout-invariance test). Reading fans one decode task per shard.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_META = "_tarshards.json"


def _key_strings(col: pa.ChunkedArray | pa.Array) -> list:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False)
        if (vals < 0).any():
            raise ValueError("write_tar_shards: negative integer keys")
        return [f"{int(v):012d}" for v in vals]
    keys = col.to_pylist()
    for k in keys:
        if k is None or "." in k or "/" in k:
            raise ValueError(
                f"write_tar_shards: key {k!r} must be a dot-free, "
                "slash-free string (WebDataset splits the sample key at "
                "the first dot) — pre-hash or reformat the key column"
            )
    return keys


def _member_bytes(value, ext: str) -> bytes:
    if ext == "json":
        return json.dumps(value, sort_keys=True, default=str).encode()
    if isinstance(value, bytes):
        return value
    if value is None:
        return b""
    return str(value).encode()


@ray.remote(num_cpus=1)
def _convert_tar(shard_dir: str, out_path: str, key_col: str,
                 columns: dict) -> dict:
    frags = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )
    cols = list(dict.fromkeys([key_col, *columns]))
    # one shard resides in memory during conversion (the same bound as
    # the .bin converter — size num_shards to the worker heap); keys
    # are hash-scattered across fragments, so per-key streaming would
    # thrash fragment loads instead of saving anything
    t = pa.concat_tables([pq.read_table(f, columns=cols) for f in frags])
    keys = _key_strings(t[key_col])
    order = sorted(range(len(keys)), key=keys.__getitem__)
    if len(set(keys)) != len(keys):
        dup = pd.Series(keys).value_counts()
        raise ValueError(
            f"write_tar_shards: duplicate sample key {dup.index[0]!r}"
        )
    payload_cols = {c: t[c].to_pylist() for c in columns}
    tmp = out_path + ".tmp"
    n_members = 0
    with tarfile.open(tmp, "w") as tf:
        for ri in order:
            k = keys[ri]
            for col, ext in columns.items():
                blob = _member_bytes(payload_cols[col][ri], ext)
                info = tarfile.TarInfo(name=f"{k}.{ext}")
                info.size = len(blob)
                info.mtime = 0  # deterministic archive bytes
                tf.addfile(info, io.BytesIO(blob))
                n_members += 1
    fd = os.open(tmp, os.O_RDONLY)
    os.fsync(fd)
    os.close(fd)
    os.replace(tmp, out_path)
    return {
        "tar": os.path.basename(out_path),
        "n_samples": len(keys),
        "n_members": n_members,
        "bytes": os.path.getsize(out_path),
    }


def write_tar_shards(
    ds,
    out_dir: str,
    *,
    key_col: str,
    columns: dict,
    num_shards: int = 8,
) -> pd.DataFrame:
    """Write ``ds`` as ``num_shards`` WebDataset-style tar shards under
    ``out_dir``. ``columns`` maps column name -> member extension.
    Shard assignment is the engine hash of the sample key (stable
    across runs and layouts); returns the manifest (one row per
    shard)."""
    from ..functions.scalar import stable_hash64

    if not columns:
        raise ValueError("write_tar_shards: columns map is empty")
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")

    def assign(batch: pa.Table) -> pa.Table:
        keys = pa.array(_key_strings(batch[key_col]), pa.string())
        h = stable_hash64(keys)
        return batch.append_column(
            "_shard", pa.array((h % np.uint64(num_shards)).astype(np.int32))
        )

    stage = str(out_dir) + "._stage"
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        stage, partition_cols=["_shard"]
    )
    os.makedirs(out_dir, exist_ok=True)
    futs = []
    for d in sorted(os.listdir(stage)):
        if not d.startswith("_shard="):
            continue
        n = int(d.split("=", 1)[1])
        futs.append(
            _convert_tar.remote(
                os.path.join(stage, d),
                os.path.join(out_dir, f"shard-{n:06d}.tar"),
                key_col,
                columns,
            )
        )
    rows = ray.get(futs)
    manifest = {"key_col": key_col, "columns": columns, "shards": rows}
    tmp = os.path.join(out_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, _META))
    import shutil

    shutil.rmtree(stage)
    return pd.DataFrame(rows)


def read_tar_shards(out_dir: str):
    """Tar layout -> Dataset: one decode task per shard; each sample's
    members reassemble into one row (key column ``__key__`` plus one
    column per manifest extension mapping; binary-typed unless the
    extension is txt/json). Unknown members fail loudly."""
    import ray.data as rd

    with open(os.path.join(out_dir, _META)) as fh:
        m = json.load(fh)
    ext_to_col = {ext: col for col, ext in m["columns"].items()}

    def decode(batch: pa.Table) -> pa.Table:
        out = []
        for name in batch["tar"].to_pylist():
            samples = {}
            with tarfile.open(os.path.join(out_dir, name), "r") as tf:
                for info in tf:
                    key, _, ext = info.name.partition(".")
                    if ext not in ext_to_col:
                        raise ValueError(
                            f"{name}: member {info.name!r} has no column "
                            "mapping in _tarshards.json"
                        )
                    samples.setdefault(key, {})[ext] = tf.extractfile(
                        info
                    ).read()
            keys = sorted(samples)
            cols = {"__key__": pa.array(keys, pa.string())}
            for ext, col in ext_to_col.items():
                vals = [samples[k].get(ext) for k in keys]
                if ext == "txt":
                    cols[col] = pa.array(
                        [v.decode() if v is not None else None for v in vals],
                        pa.string(),
                    )
                elif ext == "json":
                    cols[col] = pa.array(
                        [json.loads(v) if v else None for v in vals]
                    )
                else:
                    cols[col] = pa.array(vals, pa.large_binary())
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    names = [r["tar"] for r in m["shards"]]
    return rd.from_items([{"tar": n} for n in names]).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )
