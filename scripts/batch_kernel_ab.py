"""A/B bootstrap-replicate batching: plain vmap of the m-step (tables
re-read per replicate) vs the in-kernel replicate axis
(_m_step_v4_batch, tables read once per program). ONE process, bench
shape, B replicates, 40-iter fori deltas. Reports ms/iter/replicate."""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import (
    EmV4Data,
    _m_step_v4,
    _m_step_v4_batch,
)

N1, N2 = 10, 50
B = 8


def time_variant(fn, mult, init_b, label):
    def make(n):
        def f(m):
            def body(i, prev_b):
                out = fn(prev_b, m)
                return out * 0.5 + prev_b * 0.5
            return jax.lax.fori_loop(0, n, body, init_b)
        return f

    f1, f2 = jax.jit(make(N1)), jax.jit(make(N2))
    d = []
    for f in (f1, f2, f1, f2):
        out = f(mult)
        t0 = time.perf_counter()
        np.asarray(out)
        d.append(time.perf_counter() - t0)
    d1, d2 = min(d[0], d[2]), min(d[1], d[3])
    ms = (d2 - d1) / (N2 - N1) * 1e3
    print(f"{label}: {ms:.2f} ms/iter for B={B} "
          f"({ms / B:.2f} ms/iter/replicate; d1={d1:.2f} d2={d2:.2f})",
          flush=True)


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T, R = bench.T, bench.R
    t0 = time.perf_counter()
    data, order = EmV4Data.build(txp_id, w, boundaries, T)
    print(f"A={A} build {time.perf_counter() - t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)
    mult_reads = rng.multinomial(R, np.full(R, 1.0 / R), size=B)
    mult = jnp.asarray(mult_reads[:, np.asarray(order)],
                       dtype=jnp.float32)
    init_b = jnp.full((B, T), 10.0, dtype=jnp.float32)

    def vmapped(prev_b, m):
        return jax.vmap(lambda p, mm: _m_step_v4(data, p, mm))(prev_b, m)

    def batched(prev_b, m):
        return _m_step_v4_batch(data, prev_b, m)

    order_names = sys.argv[1:] or ["batched", "vmapped", "batched"]
    fns = {"batched": batched, "vmapped": vmapped}
    for name in order_names:
        time_variant(fns[name], mult, init_b, name)


if __name__ == "__main__":
    main()
