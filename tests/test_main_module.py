"""The runnable-module contract: ``python -m etl_example_spark`` is the
container entrypoint (Dockerfile CMD) — it must complete the reference
lifecycle and log the reference-shaped counts."""

from __future__ import annotations

import os
import subprocess
import sys


def test_module_runs_reference_lifecycle(tmp_path):
    dest = str(tmp_path / "backups")
    proc = subprocess.run(
        [
            sys.executable, "-m", "etl_example_spark",
            "--rows", "2000", "--backup-dest", dest,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "pre-curation counts" in out
    assert "'chains': 10, 'stores': 400, 'products': 80" in out
    assert "problematic rows:" in out
    assert "post-curation counts" in out
    assert "pipeline finished" in out
    # all four validation queries rendered
    for q in ("query q1", "query q2", "query q3", "query q4"):
        assert q in out, f"missing {q}"
    # the post-job whole-catalog snapshot landed with its manifest
    assert "catalog backup written" in out
    backups = os.listdir(dest)
    assert len(backups) == 1
    snap = os.path.join(dest, backups[0])
    assert sorted(os.listdir(snap)) == [
        "_MANIFEST.json", "chains", "products", "sellout", "stores",
    ]


def test_module_curate_mode_exports_shards(tmp_path):
    dest = str(tmp_path / "shards")
    proc = subprocess.run(
        [
            sys.executable, "-m", "etl_example_spark",
            "--curate", "/root/testdata/sf0.001",
            "--shards-dest", dest,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "corpus: 500 documents" in out
    assert "curated:" in out and "documents survive" in out
    assert "stratum en:" in out
    assert "shards written:" in out
    shard_dirs = [d for d in os.listdir(dest) if d.startswith("shard=")]
    assert shard_dirs, "no shard directories written"
    # the logged totals must agree with what landed on disk — shard
    # count AND row count (read back via parquet footers)
    import re

    m = re.search(r"shards written: .* \((\d+) shards, (\d+) docs\)", out)
    assert m and int(m.group(1)) == len(shard_dirs)
    import pyarrow.parquet as pq

    on_disk = sum(
        pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        for root, _, files in os.walk(dest)
        for f in files
        if f.endswith(".parquet")
    )
    assert on_disk == int(m.group(2))
