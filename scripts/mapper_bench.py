"""Mapper throughput: error-injected ONT-like reads vs the SIRV
transcriptome, single- and multi-threaded, with and without base-level
rescoring — the VERDICT r1 item-7 gate (>=3x reads/s/thread on the
rescoring path without losing top-hit accuracy).

Pure host CPU (no jax). Run: python scripts/mapper_bench.py [--reads N]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=3000)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--best-n", type=int, default=10)
    args = ap.parse_args()

    from test_mapper import load_sirv, mutate, revcomp

    from oarfish_tpu.host import mapper as mp

    names, seqs = load_sirv()
    m = mp.Mapper.from_sequences(names, seqs, threads=4)

    rng = np.random.default_rng(0)
    reads, truth = [], []
    while len(reads) < args.reads:
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        if len(s) < 300:
            continue
        span = int(rng.integers(250, min(len(s), 2000)))
        pos = int(rng.integers(0, len(s) - span + 1))
        frag = mutate(rng, s[pos : pos + span])
        reads.append(revcomp(frag) if rng.random() < 0.5 else frag)
        truth.append(t)
    total_bases = sum(len(r) for r in reads)

    # warm (index touch, thread pool)
    m.map_batch(reads[:50], best_n=args.best_n, threads=args.threads)

    t0 = time.perf_counter()
    hits = m.map_batch(reads, best_n=args.best_n, threads=args.threads)
    dt = time.perf_counter() - t0

    n_correct = n_mapped = 0
    for i in range(len(reads)):
        s, e = hits.read_off[i], hits.read_off[i + 1]
        if e == s:
            continue
        n_mapped += 1
        top = s + int(np.argmax(hits.score[s:e]))
        if hits.target[top] == truth[i]:
            n_correct += 1
    print(
        f"reads={len(reads)} threads={args.threads} wall={dt:.2f}s "
        f"-> {len(reads)/dt:.0f} reads/s ({len(reads)/dt/args.threads:.0f}"
        f"/thread), {total_bases/dt/1e6:.1f} Mbases/s | mapped "
        f"{n_mapped/len(reads):.3f} top-hit {n_correct/max(n_mapped,1):.3f}"
    )


if __name__ == "__main__":
    main()
