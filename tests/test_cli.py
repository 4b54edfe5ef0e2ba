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
