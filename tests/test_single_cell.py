"""Single-cell mode end-to-end: bucketed vmapped per-cell EMs vs a
per-cell oracle (serial NumPy EM with binomial coverage)."""

import json
from pathlib import Path

import numpy as np
import pytest

from oarfish_tpu.cli import main
from oarfish_tpu.config import FilterOpts
from oarfish_tpu.host.packer import iter_name_groups
from oarfish_tpu.io.bam import BamReader
from oarfish_tpu.models.coverage import binomial_continuous_prob, normalize_read_probs
from oarfish_tpu.ops.em_oracle import combine_weights, do_em_oracle
from oarfish_tpu.quant.single_cell import build_cell_store, iter_barcode_groups
from util_sim import simulate_bam


BARCODES = ["ACGTACGT", "CCCCAAAA", "GGGGTTTT", "TTTTCCCC", "AAAACCCC"]


@pytest.fixture(scope="module")
def sc_sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("sc")
    p = d / "sc.bam"
    names, lengths, truth = simulate_bam(
        p, num_reads=300, seed=5, barcodes=BARCODES
    )
    return d, p, names, lengths


def oracle_cell_counts(bam_path, lengths, model_coverage, bin_width=100):
    reader = BamReader(bam_path)
    opts = FilterOpts(model_coverage=model_coverage)
    out = {}
    for bc, recs in iter_barcode_groups(reader.records()):
        store, cov = build_cell_store(recs, np.asarray(lengths), opts, bin_width)
        if store.num_reads == 0:
            out[bc.decode()] = np.zeros(len(lengths))
            continue
        if model_coverage:
            flat = binomial_continuous_prob(cov)
            normalize_read_probs(store, cov, flat, bin_width)
        w = combine_weights(store.as_prob, store.cov_prob, model_coverage)
        # init avg = R_cell / T (full transcriptome size)
        init = np.full(len(lengths), store.num_reads / len(lengths))
        out[bc.decode()] = do_em_oracle(
            store.txp_id, w, store.boundaries, len(lengths),
            init_abundances=init,
        )
    return out


def read_mtx(path, T):
    lines = Path(path).read_text().splitlines()
    assert lines[0] == "%%MatrixMarket matrix coordinate real general"
    rows, cols, nnz = map(int, lines[1].split())
    assert cols == T
    m = np.zeros((rows, T))
    for line in lines[2:]:
        r, c, v = line.split()
        m[int(r) - 1, int(c) - 1] = float(v)
    assert nnz == len(lines) - 2
    return m


@pytest.mark.parametrize("model_coverage", [False, True])
def test_single_cell_end_to_end(sc_sim, model_coverage):
    d, p, names, lengths = sc_sim
    out = d / ("cov" if model_coverage else "plain") / "sc"
    argv = ["--alignments", str(p), "-o", str(out), "--single-cell",
            "--em-dtype", "float64", "--quiet"]
    if model_coverage:
        argv.append("--model-coverage")
    rc = main(argv)
    assert rc == 0

    bcs = Path(str(out) + ".barcodes.txt").read_text().split()
    assert bcs == BARCODES
    feats = Path(str(out) + ".features.txt").read_text().split()
    assert feats == names
    m = read_mtx(str(out) + ".count.mtx", len(names))
    assert m.shape[0] == len(BARCODES)

    oracle = oracle_cell_counts(p, lengths, model_coverage)
    for i, bc in enumerate(bcs):
        want = oracle[bc]
        # the mtx stores counts rounded through f32
        np.testing.assert_allclose(
            m[i], np.where(want > 0, want.astype(np.float32), 0.0),
            rtol=1e-5, atol=1e-5, err_msg=f"cell {bc}")

    meta = json.loads(Path(str(out) + ".meta_info.json").read_text())
    assert meta["single_cell"] is True
    # per-cell reads sum ~ to matrix mass
    assert m.sum() == pytest.approx(
        sum(v.sum() for v in oracle.values()), rel=1e-4)


def test_single_cell_squarem_matches_plain(sc_sim):
    """--em-accel squarem on the batched per-cell EMs lands at the
    same count matrix (fixed-point tolerance)."""
    d, p, names, lengths = sc_sim
    out_p = d / "sq_plain" / "sc"
    out_s = d / "sq_accel" / "sc"
    for out, accel in [(out_p, "none"), (out_s, "squarem")]:
        rc = main([
            "--alignments", str(p), "-o", str(out), "--single-cell",
            "--em-dtype", "float64", "--em-accel", accel, "--quiet",
        ])
        assert rc == 0
    mp = read_mtx(str(out_p) + ".count.mtx", len(names))
    ms = read_mtx(str(out_s) + ".count.mtx", len(names))
    np.testing.assert_allclose(ms, mp, rtol=5e-3, atol=0.05)


def test_single_cell_sharded_matches_single_device(sc_sim):
    """--num-shards 8 shards cell batches over the 8-device CPU mesh
    (cells axis, no per-cell collectives); the count matrix must match
    the single-device run bit-for-bit."""
    d, p, names, lengths = sc_sim
    out_1 = d / "mesh1" / "sc"
    out_8 = d / "mesh8" / "sc"
    for out, shards in [(out_1, "1"), (out_8, "8")]:
        rc = main([
            "--alignments", str(p), "-o", str(out), "--single-cell",
            "--em-dtype", "float64", "--num-shards", shards, "--quiet",
        ])
        assert rc == 0
    m1 = read_mtx(str(out_1) + ".count.mtx", len(names))
    m8 = read_mtx(str(out_8) + ".count.mtx", len(names))
    np.testing.assert_array_equal(m8, m1)
