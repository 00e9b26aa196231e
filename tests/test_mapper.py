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


def test_foreign_index_rejected_with_migration_path(tmp_path):
    """The reference accepts rammap RMMI / minimap2 .mmi indexes
    (`aligner.rs:72-98`); this build migrates sequence-bearing .mmi
    (tests/test_foreign_index.py) and fails actionably on everything
    else: a malformed .mmi gets a format error, RMMI and unknown
    formats get the rebuild message."""
    import pytest

    from oarfish_tpu.host.mmi import MmiFormatError

    bad_mmi = tmp_path / "legacy.mmi"
    bad_mmi.write_bytes(b"MMI\x02" + b"\x00" * 64)
    with pytest.raises(MmiFormatError, match="implausible"):
        mp.Mapper.load(bad_mmi)

    rmmi = tmp_path / "ram.rmi"
    rmmi.write_bytes(b"RMMI" + b"\x00" * 64)
    with pytest.raises(ValueError, match=r"rammap RMMI.*--index-out"):
        mp.Mapper.load(rmmi)

    junk = tmp_path / "junk.idx"
    junk.write_bytes(b"\x7fELFjunkjunk")
    with pytest.raises(ValueError, match="OTMI"):
        mp.Mapper.load(junk)


def test_banded_align_vs_gotoh_oracle(sirv_mapper):
    """The C banded affine aligner must equal a full Needleman/Gotoh
    NumPy oracle whenever the optimum fits in the band."""
    import ctypes

    lib = mp.get_lib()
    lib.oarfish_dbg_align.restype = ctypes.c_int32
    lib.oarfish_dbg_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int,
    ]

    def gotoh(t, q, ma=2, mm=4, go=4, ge=2):
        lt, lq = len(t), len(q)
        NEG = -(10 ** 9)
        H = np.full((lt + 1, lq + 1), NEG, dtype=np.int64)
        E = np.full_like(H, NEG)
        F = np.full_like(H, NEG)
        H[0, 0] = 0
        for j in range(1, lq + 1):
            H[0, j] = -(go + ge * j)
        for i in range(1, lt + 1):
            H[i, 0] = -(go + ge * i)
            F[i, 0] = H[i, 0]
            for j in range(1, lq + 1):
                E[i, j] = max(H[i, j - 1] - go, E[i, j - 1]) - ge
                F[i, j] = max(H[i - 1, j] - go, F[i - 1, j]) - ge
                s = ma if t[i - 1] == q[j - 1] else -mm
                H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
        return int(H[lt, lq])

    rng = np.random.default_rng(5)
    bases = b"ACGT"
    for _ in range(40):
        lt = int(rng.integers(1, 80))
        lq = max(1, lt + int(rng.integers(-10, 10)))
        t = bytes(bytearray(bases[i] for i in rng.integers(0, 4, size=lt)))
        q = bytearray(t[:lq].ljust(lq, b"A"))
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(q)))
            q[p] = bases[int(rng.integers(4))]
        q = bytes(q)
        got = lib.oarfish_dbg_align(t, lt, q, lq, 0)
        want = gotoh(t, q)
        assert got == want, (t, q, got, want)


def test_rescoring_sharpens_discrimination(sirv_mapper):
    """Base-level rescoring must keep top-hit accuracy and widen the
    best-vs-second score margin versus the chain approximation."""
    names, seqs, m = sirv_mapper
    rng = np.random.default_rng(17)
    reads, truth = [], []
    for _ in range(150):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        if len(s) < 400:
            continue
        start = int(rng.integers(0, max(1, len(s) - 300)))
        ln = int(rng.integers(300, min(2000, len(s) - start) + 1))
        reads.append(mutate(rng, s[start:start + ln], sub=0.06, indel=0.04))
        truth.append(t)

    stats = {}
    for rescore in (False, True):
        hits = m.map_batch(reads, best_n=20, threads=4, rescore=rescore)
        tophit = 0
        margins = []
        for i in range(len(reads)):
            a, b = hits.read_off[i], hits.read_off[i + 1]
            if a == b:
                continue
            sc = hits.score[a:b]
            best = int(np.argmax(sc))
            if hits.target[a:b][best] == truth[i]:
                tophit += 1
                if b - a > 1:
                    others = np.delete(sc, best)
                    margins.append(int(sc[best]) - int(others.max()))
        stats[rescore] = (tophit, float(np.median(margins)))
    assert stats[True][0] >= stats[False][0] - 2  # accuracy held
    assert stats[True][1] > stats[False][1] * 1.15  # sharper margins


def test_dp_cache_cap_identical_results(sirv_mapper):
    """--dp-cache-cap-mb (`RAMMAP_DP_CACHE_CAP_MB`, `main.rs:346-349`)
    bounds per-thread scratch retention only — mapping output must be
    bit-identical under any cap, including one that forces a release
    after every read."""
    names, seqs, m = sirv_mapper
    rng = np.random.default_rng(7)
    reads = []
    for i in range(60):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        if len(s) < 400:
            continue
        span = int(rng.integers(300, min(len(s), 1500)))
        pos = int(rng.integers(0, len(s) - span + 1))
        reads.append(mutate(rng, s[pos : pos + span]))
    # a 100 kb read balloons the minimizer window ring past 1 MB, so the
    # capped run genuinely exercises the release path
    long_read = bytes(
        np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=100_000)
        ]
    )
    reads.insert(0, long_read)
    assert mp.set_dp_cache_cap_mb(1)
    try:
        capped = m.map_batch(reads, best_n=10, threads=3)
    finally:
        assert mp.set_dp_cache_cap_mb(None)  # restore the 128 MB default
    base = m.map_batch(reads, best_n=10, threads=3)
    np.testing.assert_array_equal(capped.read_off, base.read_off)
    np.testing.assert_array_equal(capped.target, base.target)
    np.testing.assert_array_equal(capped.score, base.score)
    np.testing.assert_array_equal(capped.tstart, base.tstart)
    np.testing.assert_array_equal(capped.tend, base.tend)


def _py_hash64(x, mask):
    M = (1 << 64) - 1
    x = (~x + (x << 21)) & M & mask
    x = (x ^ (x >> 24)) & M
    x = (x + (x << 3) + (x << 8)) & M & mask
    x = (x ^ (x >> 14)) & M
    x = (x + (x << 2) + (x << 4)) & M & mask
    x = (x ^ (x >> 28)) & M
    x = (x + (x << 31)) & M & mask
    return x


_NT4 = {ord(c): v for cs, v in
        (("Aa", 0), ("Cc", 1), ("Gg", 2), ("TtUu", 3)) for c in cs}


def _py_extract(seq, k, w, rid):
    """Python transliteration of the windowed-minima minimizer
    recurrence (ADVICE r4: in-suite oracle for the single-pass
    ring-buffer extraction in csrc/mapper.cpp:116)."""
    out = []
    if len(seq) < k:
        return out
    mask = (1 << (2 * k)) - 1 if k < 32 else (1 << 64) - 1
    fwd = rev = l = 0
    win = []
    for i, b in enumerate(seq):
        c = _NT4.get(b, 4)
        if c >= 4:
            l = 0
            fwd = rev = 0
            continue
        fwd = ((fwd << 2) | c) & mask
        rev = (rev >> 2) | ((3 - c) << (2 * (k - 1)))
        l += 1
        if l < k:
            continue
        if fwd < rev:
            key, strand = fwd, 0
        elif rev < fwd:
            key, strand = rev, 1
        else:
            continue  # palindromic k-mer: strand ambiguous
        win.append((_py_hash64(key, mask), i + 1 - k, strand))
    if not win:
        return out
    dq, head, last = [], 0, None
    for i in range(len(win)):
        while len(dq) > head and win[dq[-1]][0] >= win[i][0]:
            dq.pop()
        dq.append(i)
        if i + 1 >= w:
            while dq[head] + w <= i:
                head += 1
            m = dq[head]
            if m != last:
                out.append((win[m][0], rid, win[m][1], win[m][2]))
                last = m
    if len(win) < w:  # short sequence: global minimum
        m = min(range(len(win)), key=lambda i: (win[i][0], i))
        out.append((win[m][0], rid, win[m][1], win[m][2]))
    return out


def _read_otmi(path):
    import struct

    data = open(path, "rb").read()
    off = 8
    k, w = struct.unpack_from("<ii", data, off); off += 8
    (nt,) = struct.unpack_from("<Q", data, off); off += 8
    for _ in range(nt):
        (ln,) = struct.unpack_from("<I", data, off); off += 4 + ln
    off += nt * 4  # lengths
    (so,) = struct.unpack_from("<Q", data, off); off += 8 + so * 8
    (sl,) = struct.unpack_from("<Q", data, off); off += 8 + sl
    (nk,) = struct.unpack_from("<Q", data, off); off += 8
    keys = struct.unpack_from(f"<{nk}Q", data, off); off += nk * 8
    key_off = struct.unpack_from(f"<{nk + 1}Q", data, off)
    off += (nk + 1) * 8
    (npo,) = struct.unpack_from("<Q", data, off); off += 8
    postings = struct.unpack_from(f"<{npo}Q", data, off)
    return keys, key_off, postings


def test_minimizer_extraction_vs_python_oracle(tmp_path):
    """Randomized index builds (incl. w at pow2 boundaries, short seqs,
    N runs, 1/3/4 threads) vs the Python transliteration of the
    minimizer recurrence + serial sort (ADVICE r4 item 4)."""
    import random

    random.seed(1234)
    alpha = b"ACGTacgtN"
    for trial in range(12):
        k = random.choice([5, 7, 13, 15])
        w = random.choice([1, 2, 3, 4, 7, 8, 15, 16, 19])
        n_seqs = random.randint(1, 5)
        seqs = [
            bytes(random.choice(alpha) for _ in range(random.choice(
                [0, 3, k - 1, k, k + w - 2, k + w, 50, 300, 2000])))
            for _ in range(n_seqs)
        ]
        names = [f"t{i}" for i in range(n_seqs)]
        threads = random.choice([1, 3, 4])
        m = mp.Mapper.from_sequences(
            names, seqs, kw=(k, w), threads=threads, freq_cutoff_frac=0.0)
        p = tmp_path / f"t{trial}.otmi"
        m.save(p)
        keys, key_off, postings = _read_otmi(p)

        allm = []
        for rid, s in enumerate(seqs):
            allm.extend(_py_extract(s, k, w, rid))
        by_key = {}
        for key, rid, pos, strand in allm:
            by_key.setdefault(key, []).append(
                (rid << 33) | (pos << 1) | strand)
        exp_keys = sorted(by_key)
        got = {keys[i]: list(postings[key_off[i]:key_off[i + 1]])
               for i in range(len(keys))}
        exp = {kk: sorted(by_key[kk]) for kk in exp_keys}
        assert list(keys) == exp_keys, (
            f"trial {trial}: key set mismatch (k={k} w={w} thr={threads})")
        assert got == exp, (
            f"trial {trial}: postings mismatch (k={k} w={w} thr={threads})")
