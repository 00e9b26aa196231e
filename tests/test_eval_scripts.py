"""Evaluation-protocol script: end-to-end on a simulated run."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from oarfish_tpu.cli import main
from util_sim import simulate_bam


def test_eval_sim_protocol(tmp_path):
    p = tmp_path / "s.bam"
    names, lengths, truth = simulate_bam(p, num_reads=600, seed=13)
    out = tmp_path / "q"
    assert main(["--alignments", str(p), "-o", str(out),
                 "--em-dtype", "float64", "--quiet"]) == 0

    # truth table in the sim-eval format
    rng_counts = np.round(truth * 600)
    truth_tsv = tmp_path / "truth.tsv"
    with open(truth_tsv, "w") as fh:
        fh.write("name\ttrue_count\n")
        for n, c in zip(names, rng_counts):
            fh.write(f"{n}\t{c}\n")

    r = subprocess.run(
        [sys.executable, "scripts/eval_quant.py", "sim",
         str(out) + ".quant", str(truth_tsv)],
        capture_output=True, text=True, cwd=Path(__file__).parent.parent,
    )
    assert r.returncode == 0, r.stderr
    res = json.loads(r.stdout)
    assert res["spearman"] > 0.8
    assert res["mard"] < 0.8
    assert res["n"] == len(names)


def test_eval_sirv_protocol(tmp_path):
    p = tmp_path / "s.bam"
    names, lengths, truth = simulate_bam(p, num_reads=600, seed=14)
    out = tmp_path / "q"
    assert main(["--alignments", str(p), "-o", str(out),
                 "--em-dtype", "float64", "--quiet"]) == 0
    conc = tmp_path / "molar.tsv"
    with open(conc, "w") as fh:
        fh.write("Name\tE0\n")
        for i, n in enumerate(names):
            # mark a couple as absent from the mix
            fh.write(f"{n}\t{0.0 if i % 7 == 3 else truth[i]:.6f}\n")
    r = subprocess.run(
        [sys.executable, "scripts/eval_quant.py", "sirv",
         str(out) + ".quant", str(conc), "--mix", "E0"],
        capture_output=True, text=True, cwd=Path(__file__).parent.parent,
    )
    assert r.returncode == 0, r.stderr
    res = json.loads(r.stdout)
    assert -1.0 <= res["spearman"] <= 1.0
    assert res["n_present"] + res["n_absent"] >= 1


def test_coverage_model_resolves_degraded_ambiguity(tmp_path):
    """The coverage model's VALUE case (reference README.md:137-150):
    on 3'-anchored truncated reads over 3'-sharing isoform pairs,
    --model-coverage must substantially reduce MARD vs truth
    (scripts/degraded_cov_eval.py is the full harness; this pins the
    effect at small scale)."""
    import numpy as np

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from degraded_cov_eval import simulate_degraded_bam

    from oarfish_tpu.cli import main

    bam_p = tmp_path / "deg.bam"
    names, lengths, truth, scenario = simulate_degraded_bam(
        bam_p, pairs=16, reads=5000, seed=3)

    mards = {}
    for label, cov in (("no_cov", False), ("cov", True)):
        out = tmp_path / label
        argv = ["--alignments", str(bam_p), "-o", str(out),
                "--em-dtype", "float64", "--quiet"]
        if cov:
            argv.append("--model-coverage")
        assert main(argv) == 0
        q = {}
        with open(f"{out}.quant") as fh:
            next(fh)
            for line in fh:
                n, _l, c = line.split("\t")
                q[n] = float(c)
        est = np.array([q.get(n, 0.0) for n in names])
        denom = np.maximum(np.maximum(truth, est), 1e-12)
        mards[label] = float((np.abs(est - truth) / denom).mean())

    # without coverage, score-tied S/L pairs split ~50/50 (MARD ~0.5+);
    # with it the stacked-tail penalty resolves them
    assert mards["cov"] < mards["no_cov"] - 0.2, mards
    assert mards["cov"] < 0.25, mards
