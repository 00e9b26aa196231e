"""Benchmark: sparse EM inner-loop throughput on the TPU chip.

Workload: human-transcriptome-scale synthetic CSR (200k transcripts, 2M
reads, ~3 alignments/read), 100 fixed EM iterations in f32 on device —
the BASELINE.json config 3 shape ("Human GENCODE ~5M-read ONT cDNA",
scaled to bench time). Prints ONE JSON line.

`vs_baseline` is measured against a vectorized NumPy implementation of the
same m-step on this host's CPU (the stand-in for the reference's CPU EM;
the Rust toolchain is unavailable in this image, and the reference's own
m-step is the same O(A) gather/scatter pattern).
"""

import json
import os
import sys
import time

import numpy as np

R = 2_000_000
T = 200_000
MEAN_K = 3
ITERS = 50
CPU_ITERS = 2


def make_csr(seed=0):
    rng = np.random.default_rng(seed)
    sizes = rng.geometric(1.0 / MEAN_K, size=R).clip(1, 100)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    # zipf-ish transcript popularity
    pop = rng.zipf(1.3, size=A) % T
    txp_id = pop.astype(np.int32)
    w = np.exp(rng.normal(0, 0.5, size=A)).astype(np.float32)
    read_id = np.repeat(np.arange(R, dtype=np.int32), sizes)
    return txp_id, w, boundaries, read_id, A


def bench_tpu(txp_id, w, read_id):
    """Time the fused EM while-loop on device.

    The axon tunnel defers execution: `block_until_ready` returns without
    waiting and only a host transfer (`np.asarray`) synchronizes, with a
    large fixed per-request latency. So we time two runs with different
    iteration counts (each synchronized by transferring the T-sized result)
    and take the delta — the fixed tunnel overhead cancels, leaving pure
    device iteration time.
    """
    import jax.numpy as jnp

    from oarfish_tpu.ops.em_fast import FastEmData, run_em_fast

    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(np.bincount(read_id, minlength=R), out=boundaries[1:])
    data, _order = FastEmData.build(
        txp_id, w, boundaries, T, dtype=jnp.float32
    )
    init = jnp.full(T, float(R) / T, dtype=jnp.float32)

    def timed(n_iters):
        # convergence_thresh < 0 can never trigger (rel_diff >= 0)
        counts, niter = run_em_fast(data, init, n_iters, -1.0)
        t0 = time.perf_counter()
        out = np.asarray(counts)
        dt = time.perf_counter() - t0
        assert int(np.asarray(niter)) == n_iters
        return dt, out

    timed(ITERS)  # compile + warm the tunnel
    timed(3 * ITERS)
    t_small, counts = timed(ITERS)
    t_big, _ = timed(3 * ITERS)
    dt = (t_big - t_small) / 2
    sys.stderr.write(
        f"tpu raw: {ITERS} iters in {t_small:.3f}s, "
        f"{3 * ITERS} iters in {t_big:.3f}s (per-{ITERS} delta {dt:.3f}s)\n"
    )
    if dt <= 0:
        dt = max(t_big / 2.0, 1e-9)
    return dt, counts


def bench_cpu(txp_id, w, boundaries, read_id):
    """Vectorized NumPy m-step (f64, like the reference accumulators)."""
    w64 = w.astype(np.float64)
    prev = np.full(T, float(R) / T)
    order = np.argsort(txp_id, kind="stable")
    t_sorted = txp_id[order]
    t0 = time.perf_counter()
    for _ in range(CPU_ITERS):
        contrib = prev[txp_id] * w64
        denom = np.add.reduceat(contrib, boundaries[:-1])
        scale = np.where(denom > 1e-30, 1.0 / denom, 0.0)
        inc = contrib * scale[read_id]
        curr = np.zeros(T)
        np.add.at(curr, t_sorted, inc[order])
        prev = curr
    dt = (time.perf_counter() - t0) / CPU_ITERS * ITERS
    return dt, prev


def main():
    quick = "--quick" in sys.argv
    global R, T, ITERS
    if quick:
        R, T, ITERS = 100_000, 20_000, 20
    txp_id, w, boundaries, read_id, A = make_csr()
    sys.stderr.write(f"bench: R={R} T={T} A={A} iters={ITERS}\n")

    tpu_dt, tpu_counts = bench_tpu(txp_id, w, read_id)
    reads_per_s = R * ITERS / tpu_dt
    sys.stderr.write(
        f"tpu: {tpu_dt:.3f}s for {ITERS} iters "
        f"({ITERS / tpu_dt:.1f} iters/s, {reads_per_s:.3g} reads*iter/s)\n"
    )

    cpu_dt, cpu_counts = bench_cpu(txp_id, w, boundaries, read_id)
    sys.stderr.write(f"cpu (numpy, extrapolated): {cpu_dt:.3f}s for {ITERS} iters\n")

    # sanity: the two paths agree on the mass balance
    mass_err = abs(float(tpu_counts.sum()) - float(cpu_counts.sum())) / R
    sys.stderr.write(f"mass agreement: {mass_err:.2e}\n")

    print(
        json.dumps(
            {
                "metric": "em_reads_per_sec",
                "value": round(reads_per_s, 1),
                "unit": "reads*iters/s (R=2M,T=200k,A~6M,f32, 1 chip, scatter-free EM)",
                "vs_baseline": round(cpu_dt / tpu_dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
