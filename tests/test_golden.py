"""Frozen golden outputs: byte-exact expected files for the simulated
test BAMs, pinned in tests/golden/. Differential tests elsewhere compare
two live implementations that share the builder's reading of the
reference; these goldens pin the OUTPUT BYTES themselves so any semantic
drift — in filters, EM, or writers — must show up as a deliberate golden
update in review (VERDICT r1 weak-item 5).

Regenerate with  OARFISH_UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py
after an intentional behavior change, and inspect the diff.

Volatile meta fields (timings, absolute paths) are masked before
comparison; everything else in `.meta_info.json` is pinned too.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from util_sim import simulate_bam

GOLDEN = Path(__file__).resolve().parent / "golden"
REPO = Path(__file__).resolve().parent.parent
UPDATE = os.environ.get("OARFISH_UPDATE_GOLDEN") == "1"


def _run_cli(argv, cwd):
    env = dict(os.environ)
    env["OARFISH_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "oarfish_tpu", *argv],
        env=env, cwd=cwd, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-3000:]


def _mask_meta(text: str) -> bytes:
    """Stable form of `.meta_info.json`: zero the timing block, relative
    paths (goldens must not encode tmp dirs)."""
    d = json.loads(text)
    d["alignment_time"] = {"comment": "masked", "human_time": "0s",
                           "seconds": 0.0}
    for key in ("alignments", "output"):
        if d.get(key):
            d[key] = Path(d[key]).name
    return (json.dumps(d, indent=2) + "\n").encode()


def _check(tag: str, name: str, data: bytes):
    path = GOLDEN / tag / name
    if UPDATE:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(data)
        return
    assert path.exists(), (
        f"golden file {path} missing — generate with OARFISH_UPDATE_GOLDEN=1"
    )
    expect = path.read_bytes()
    assert data == expect, (
        f"{tag}/{name} drifted from the pinned golden output "
        f"({len(data)} vs {len(expect)} bytes). If the change is "
        "intentional, regenerate with OARFISH_UPDATE_GOLDEN=1 and review "
        "the diff."
    )


def _compare_outputs(tag: str, out: Path, names):
    for n in names:
        p = Path(str(out) + n)
        data = (
            _mask_meta(p.read_text()) if n == ".meta_info.json"
            else p.read_bytes()
        )
        _check(tag, "out" + n, data)


def test_golden_bulk(tmp_path):
    """Bulk alignment mode: .quant / .ambig_info.tsv / .prob /
    .meta_info.json pinned (writers: `write_function.rs:73-148,226-340`)."""
    bam = tmp_path / "sim.bam"
    simulate_bam(bam, num_reads=600, seed=42)
    out = tmp_path / "out"
    _run_cli([
        "--alignments", str(bam), "-o", str(out),
        "--em-dtype", "float64", "--em-impl", "segsum",
        "--write-assignment-probs", "--quiet",
    ], tmp_path)
    _compare_outputs("bulk", out, [
        ".quant", ".ambig_info.tsv", ".prob", ".meta_info.json",
    ])


def test_golden_bulk_coverage(tmp_path):
    """Bulk with the logistic coverage model (`logistic_probability.rs`)
    and three-filter preset."""
    bam = tmp_path / "sim.bam"
    simulate_bam(bam, num_reads=600, seed=43)
    out = tmp_path / "cov"
    _run_cli([
        "--alignments", str(bam), "-o", str(out),
        "--em-dtype", "float64", "--em-impl", "segsum",
        "--model-coverage", "--bin-width", "100", "--quiet",
    ], tmp_path)
    _compare_outputs("bulk_cov", out, [
        ".quant", ".ambig_info.tsv", ".meta_info.json",
    ])


def test_golden_bootstraps(tmp_path):
    """Bootstrap replicates: pinned as exact float64 text (the .pq
    container bytes depend on the pyarrow build, so the VALUES are the
    parity surface; `bootstrap.rs` + `parquet_utils.rs:15-44`)."""
    import numpy as np
    import pyarrow.parquet as pq

    bam = tmp_path / "sim.bam"
    simulate_bam(bam, num_reads=400, seed=44)
    out = tmp_path / "boot"
    _run_cli([
        "--alignments", str(bam), "-o", str(out),
        "--em-dtype", "float64", "--em-impl", "segsum",
        "--num-bootstraps", "8", "--seed", "7", "--quiet",
    ], tmp_path)
    t = pq.read_table(str(out) + ".infreps.pq")
    assert t.num_columns == 8
    assert [f.name for f in t.schema] == [f"bootstrap.{i}" for i in range(8)]
    lines = []
    for col in t.column_names:
        vals = np.asarray(t[col])
        lines.append("\t".join(np.format_float_repr(v) for v in vals)
                     if hasattr(np, "format_float_repr")
                     else "\t".join(repr(float(v)) for v in vals))
    _check("bootstrap", "infreps.tsv", ("\n".join(lines) + "\n").encode())
    _compare_outputs("bootstrap", out, [".quant", ".meta_info.json"])


def test_golden_single_cell(tmp_path):
    """Single-cell mode: .count.mtx / .features.txt / .barcodes.txt
    pinned (`write_function.rs:25-70`, `single_cell.rs:169-264`)."""
    bam = tmp_path / "sc.bam"
    simulate_bam(
        bam, num_reads=300, seed=45,
        barcodes=[f"BC{i:02d}" for i in range(6)],
    )
    out = tmp_path / "sc"
    _run_cli([
        "--alignments", str(bam), "-o", str(out), "--single-cell",
        "--em-dtype", "float64", "--quiet",
    ], tmp_path)
    _compare_outputs("single_cell", out, [
        ".count.mtx", ".features.txt", ".barcodes.txt", ".meta_info.json",
    ])


@pytest.mark.skipif(UPDATE, reason="generation pass")
def test_goldens_exist():
    """The golden tree is part of the repo — fail loudly if it vanishes."""
    expect = [
        "bulk/out.quant", "bulk/out.prob",
        "bulk_cov/out.quant", "bootstrap/infreps.tsv",
        "single_cell/out.count.mtx",
    ]
    missing = [p for p in expect if not (GOLDEN / p).exists()]
    assert not missing, f"missing goldens: {missing}"
