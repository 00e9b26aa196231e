"""A/B OARFISH_ROUTE_Q128 (quota rounded to 128 multiples -> exchange
transposes move intact lane tiles) at the bench shape, one process.
Geometry changes, so each variant builds its own EmV4Data; timing
functions are compiled once per variant and interleaved A/B/A/B."""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import EmV4Data, _m_step_v4

N1, N2 = 20, 120


def make_fns(data, init):
    def make(n):
        def f(d):
            def body(i, prev):
                return _m_step_v4(d, prev, None) * 0.5 + prev * 0.5
            return jax.lax.fori_loop(0, n, body, init)
        return f

    return jax.jit(make(N1)), jax.jit(make(N2))


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    init = jnp.full(T, 10.0, dtype=jnp.float32)
    variants = []
    for q128 in ("0", "1"):
        os.environ["OARFISH_ROUTE_Q128"] = q128
        t0 = time.perf_counter()
        data, _ = EmV4Data.build(txp_id, w, boundaries, T)
        pa = data.p_a
        print(
            f"q128={q128} build {time.perf_counter() - t0:.0f}s "
            f"n_chunks={pa.n_src} CR={pa.chunk_rows} Q={pa.Q} "
            f"R1={pa.R1}",
            flush=True,
        )
        # compile with the right env still set (trace-time knobs)
        f1, f2 = make_fns(data, init)
        variants.append((q128, data, f1, f2))
    timings = {q: [] for q, *_ in variants}
    for _rep in range(3):
        for q128, data, f1, f2 in variants:
            d = []
            for f in (f1, f2):
                out = f(data)
                t0 = time.perf_counter()
                np.asarray(out)
                d.append(time.perf_counter() - t0)
            ms = (d[1] - d[0]) / (N2 - N1) * 1e3
            timings[q128].append(ms)
            print(f"q128={q128}: {ms:.2f} ms/iter", flush=True)
    for q, ts in timings.items():
        print(f"q128={q}: min {min(ts):.2f} ms/iter over {len(ts)} reps",
              flush=True)


if __name__ == "__main__":
    main()
