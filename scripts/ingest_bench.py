"""Host ingest profiling: generate a synthetic name-collated BAM at a
realistic shape (geometric alignment counts, CIGAR with clips), then
time each pack stage: C++ columnar decode, vectorized filters, coverage
binning, CSR assembly. CPU-only; run when the machine is otherwise idle
(numbers are meaningless next to a running pytest suite).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oarfish_tpu.config import FilterOpts
from oarfish_tpu.host import native
from oarfish_tpu.host.store import TranscriptCoverage
from oarfish_tpu.host.vector_filter import filter_records
from oarfish_tpu.io import bam

R = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
T = 20_000
MEAN_K = 3
THREADS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                            else ["1", "4", "8", "16"])]
PATH = "/tmp/ingest_bench.bam"
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
POOL = bytes(
    np.random.default_rng(3).choice(BASES, size=4_000_000)
).decode()


def build_bam():
    rng = np.random.default_rng(7)
    lens = rng.integers(300, 12_000, size=T)
    names = [f"t{i}" for i in range(T)]
    sizes = rng.geometric(1.0 / MEAN_K, size=R).clip(1, 50)
    A = int(sizes.sum())
    print(f"building BAM: R={R} A={A}", flush=True)
    recs = []
    read_of = np.repeat(np.arange(R), sizes)
    tids = rng.integers(0, T, size=A)
    t0 = time.perf_counter()
    for i in range(A):
        tid = int(tids[i])
        tl = int(lens[tid])
        span = min(tl, int(rng.integers(200, 3000)))
        pos = int(rng.integers(0, max(tl - span, 1)))
        first = i == 0 or read_of[i] != read_of[i - 1]
        rec = dict(
            name=f"r{read_of[i]}",
            flag=0 if first else 256,
            ref_id=tid,
            pos=pos,
            cigar=f"12S{span}M9S",
            score=span - int(rng.integers(0, 60)),
        )
        if first:
            # primaries carry the read sequence (secondaries are SEQ '*'
            # in minimap2 output); this is what dominates BGZF bytes.
            # Random bases — repeated motifs deflate unrealistically well.
            n = span + 21
            o = int(rng.integers(0, len(POOL) - n))
            rec["seq"] = POOL[o : o + n]
        recs.append(rec)
    bam.write_bam(PATH, names, [int(x) for x in lens], recs)
    sz = Path(PATH).stat().st_size
    print(f"BAM written: {A} records, {sz/1e6:.1f} MB "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
    return A, np.asarray(lens, dtype=np.int64)


def main():
    A, txp_len = build_bam()
    opts = FilterOpts()
    for th in THREADS:
        t0 = time.perf_counter()
        dec = native.decode_bam(PATH, threads=th)
        t_dec = time.perf_counter() - t0
        assert dec is not None
        t0 = time.perf_counter()
        packed = filter_records(opts, txp_len, dec.columns)
        t_filt = time.perf_counter() - t0
        t0 = time.perf_counter()
        cov = TranscriptCoverage(txp_len, 100)
        cov.add_intervals(packed.txp_id, packed.start, packed.end)
        t_cov = time.perf_counter() - t0
        tot = t_dec + t_filt + t_cov
        print(
            f"threads={th:2d} decode {t_dec:6.2f}s ({A/t_dec/1e6:5.2f}M/s)"
            f"  filter {t_filt:5.2f}s  cov {t_cov:5.2f}s"
            f"  total {tot:6.2f}s ({A/tot/1e6:5.2f}M rec/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
