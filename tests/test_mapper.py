"""Native minimizer mapper: index round-trip and mapping accuracy on
error-injected reads drawn from the SIRV transcriptome."""

import numpy as np
import pytest

from oarfish_tpu.host import mapper as mp
from oarfish_tpu.io.fasta import iter_fastx
from util_sim import SIRV_FASTA

pytestmark = pytest.mark.skipif(
    not mp.available(), reason="native mapper not built"
)


def load_sirv():
    if SIRV_FASTA.exists():
        pairs = list(iter_fastx(SIRV_FASTA))
    else:
        rng = np.random.default_rng(0)
        pairs = [
            (f"SYN{i}", bytes(rng.choice(list(b"ACGT"), size=1500)))
            for i in range(10)
        ]
    return [n for n, _ in pairs], [s for _, s in pairs]


def mutate(rng, seq, sub=0.05, indel=0.02):
    out = bytearray()
    bases = b"ACGT"
    for b in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(bases[rng.integers(4)])  # insertion
        if rng.random() < sub:
            out.append(bases[rng.integers(4)])
        else:
            out.append(b)
    return bytes(out)


def revcomp(seq):
    return seq.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


@pytest.fixture(scope="module")
def sirv_mapper():
    names, seqs = load_sirv()
    return names, seqs, mp.Mapper.from_sequences(names, seqs, threads=4)


def test_mapping_accuracy_ont_like(sirv_mapper):
    names, seqs, m = sirv_mapper
    rng = np.random.default_rng(0)
    reads, truth, strands = [], [], []
    for i in range(300):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        if len(s) < 300:
            continue
        span = int(rng.integers(250, min(len(s), 2000)))
        pos = int(rng.integers(0, len(s) - span + 1))
        frag = mutate(rng, s[pos : pos + span])
        rc = rng.random() < 0.5
        reads.append(revcomp(frag) if rc else frag)
        truth.append(t)
        strands.append(rc)
    hits = m.map_batch(reads, best_n=10)
    n_correct = 0
    n_mapped = 0
    strand_ok = 0
    for i in range(len(reads)):
        s, e = hits.read_off[i], hits.read_off[i + 1]
        if e == s:
            continue
        n_mapped += 1
        top = s + int(np.argmax(hits.score[s:e]))
        if hits.target[top] == truth[i]:
            n_correct += 1
            if bool(hits.is_rc[top]) == strands[i]:
                strand_ok += 1
    assert n_mapped / len(reads) > 0.95, f"mapped {n_mapped}/{len(reads)}"
    assert n_correct / n_mapped > 0.9, f"top-hit acc {n_correct}/{n_mapped}"
    assert strand_ok / max(n_correct, 1) > 0.95


def test_multimapping_isoforms(sirv_mapper):
    names, seqs, m = sirv_mapper
    # a clean prefix of one transcript should hit that transcript with the
    # best score, and isoforms sharing sequence may appear as secondaries
    t = int(np.argmax([len(s) for s in seqs]))
    read = seqs[t][:800]
    hits = m.map_batch([read], best_n=20)
    assert hits.read_off[1] > 0
    top = int(np.argmax(hits.score))
    assert hits.target[top] == t
    # clean read: score close to 2*len
    assert hits.score[top] > 1.2 * len(read)


def test_index_save_load_roundtrip(sirv_mapper, tmp_path):
    names, seqs, m = sirv_mapper
    p = tmp_path / "sirv.otmi"
    digest = {"digest": {"names": "x"}}
    m.save(p, digest_map=digest)
    assert mp.index_digest_footer(p) == digest
    m2 = mp.Mapper.load(p)
    assert m2.names == m.names
    assert m2.lengths == m.lengths
    assert (m2.k, m2.w) == (m.k, m.w)
    read = seqs[0][:500]
    h1 = m.map_batch([read])
    h2 = m2.map_batch([read])
    np.testing.assert_array_equal(h1.target, h2.target)
    np.testing.assert_array_equal(h1.score, h2.score)
