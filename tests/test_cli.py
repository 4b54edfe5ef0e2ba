"""CLI surface smoke (subprocess — owns its own Ray session)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_cli_extract_and_report(tmp_path, fixture_pages):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "textextract_ray",
            "extract",
            "--input",
            os.path.dirname(fixture_pages[0]),
            "--out",
            out_dir,
            "--shards-per-partition",
            "2",
            "--giant-threshold",
            str(1 << 17),
        ],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "partition_id" in r.stdout

    # refusal without --resume
    r2 = subprocess.run(
        [sys.executable, "-m", "textextract_ray", "extract", "--input",
         os.path.dirname(fixture_pages[0]), "--out", out_dir],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=60,
    )
    assert r2.returncode == 2
    assert "--resume" in r2.stderr

    r3 = subprocess.run(
        [sys.executable, "-m", "textextract_ray", "report", "--out", out_dir],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=60,
    )
    assert r3.returncode == 0
    assert '"extractor_version": "1.0.0"' in r3.stdout


def test_cli_extract_table_mode(tmp_path, fixture_pages):
    """--table commits partitions into the versioned table log; a rerun
    is a note-based no-op; `table history` shows the job versions."""
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    tdir = str(tmp_path / "tbl")
    args = [
        sys.executable, "-m", "textextract_ray", "extract",
        "--input", os.path.dirname(fixture_pages[0]),
        "--table", tdir, "--shards-per-partition", "2",
    ]
    r = subprocess.run(args, cwd="/root/repo", env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "partition_id" in r.stdout
    h = subprocess.run(
        [sys.executable, "-m", "textextract_ray", "table", "history",
         "--table", tdir],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=120,
    )
    assert h.returncode == 0, h.stderr[-2000:]
    assert "job-part:" in h.stdout
    # rerun: no new versions (note-based resume)
    r2 = subprocess.run(args, cwd="/root/repo", env=env,
                        capture_output=True, text=True, timeout=240)
    assert r2.returncode == 0, r2.stderr[-2000:]
    h2 = subprocess.run(
        [sys.executable, "-m", "textextract_ray", "table", "history",
         "--table", tdir],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=120,
    )
    assert h2.stdout == h.stdout

    # neither --out nor --table: clean usage error
    r3 = subprocess.run(
        [sys.executable, "-m", "textextract_ray", "extract", "--input",
         os.path.dirname(fixture_pages[0])],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=60,
    )
    assert r3.returncode == 2 and "--table" in r3.stderr
