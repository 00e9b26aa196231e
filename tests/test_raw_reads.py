"""Raw-read mode end-to-end: FASTA reads -> native mapper -> EM -> quant,
including --only-index / --index round trips."""

import gzip
import json
from pathlib import Path

import numpy as np
import pytest

from oarfish_tpu.cli import main
from oarfish_tpu.host import mapper as mp
from test_mapper import load_sirv, mutate, revcomp

pytestmark = pytest.mark.skipif(
    not mp.available(), reason="native mapper not built"
)


@pytest.fixture(scope="module")
def raw_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    names, seqs = load_sirv()
    ref_fa = d / "ref.fa"
    with open(ref_fa, "w") as fh:
        for n, s in zip(names, seqs):
            fh.write(f">{n}\n{s.decode()}\n")
    # simulate reads from a skewed truth
    rng = np.random.default_rng(3)
    usable = [i for i, s in enumerate(seqs) if len(s) >= 400]
    w = rng.dirichlet(np.ones(len(usable)))
    truth = np.zeros(len(names))
    reads_fq = d / "reads.fq.gz"
    n_reads = 500
    with gzip.open(reads_fq, "wt") as fh:
        for r in range(n_reads):
            t = usable[int(rng.choice(len(usable), p=w))]
            truth[t] += 1
            s = seqs[t]
            span = int(rng.integers(300, min(len(s), 2500)))
            pos = int(rng.integers(0, len(s) - span + 1))
            frag = mutate(rng, s[pos : pos + span])
            if rng.random() < 0.5:
                frag = revcomp(frag)
            fh.write(f"@read{r}\n{frag.decode()}\n+\n{'I' * len(frag)}\n")
    return d, ref_fa, reads_fq, names, truth


def test_raw_read_quant(raw_fixture):
    d, ref_fa, reads_fq, names, truth = raw_fixture
    out = d / "rq" / "q"
    rc = main([
        "--reads", str(reads_fq), "--annotated", str(ref_fa),
        "--seq-tech", "ont-cdna", "-o", str(out),
        "--em-dtype", "float64", "--quiet",
    ])
    assert rc == 0
    lines = Path(str(out) + ".quant").read_text().splitlines()
    got = {l.split("\t")[0]: float(l.split("\t")[2]) for l in lines[1:]}
    assert set(got) == set(names)
    est = np.array([got[n] for n in names])
    total = est.sum()
    assert total > 0.9 * truth.sum()  # most reads quantified
    # correlation with the simulation truth
    corr = np.corrcoef(est, truth)[0, 1]
    assert corr > 0.95, f"corr {corr}"
    meta = json.loads(Path(str(out) + ".meta_info.json").read_text())
    assert meta["alignment_source"] == "from_raw_reads"
    assert "annotated_digest" in meta["digest"]


def test_only_index_then_quant(raw_fixture):
    d, ref_fa, reads_fq, names, truth = raw_fixture
    idx = d / "sirv.otmi"
    rc = main(["--only-index", "--annotated", str(ref_fa),
               "--seq-tech", "ont-cdna", "--index-out", str(idx)])
    assert rc == 0 and idx.exists()
    # footer is readable
    footer = mp.index_digest_footer(idx)
    assert "annotated_digest" in footer

    out = d / "iq" / "q"
    rc = main([
        "--reads", str(reads_fq), "--index", str(idx),
        "--seq-tech", "ont-cdna", "-o", str(out),
        "--em-dtype", "float64", "--quiet",
    ])
    assert rc == 0
    lines = Path(str(out) + ".quant").read_text().splitlines()
    got_idx = np.array([float(l.split("\t")[2]) for l in lines[1:]])

    # same result as the build-from-FASTA run
    base = d / "rq" / "q.quant"
    got_fa = np.array(
        [float(l.split("\t")[2]) for l in base.read_text().splitlines()[1:]]
    )
    np.testing.assert_allclose(got_idx, got_fa, rtol=1e-12)
