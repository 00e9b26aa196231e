"""Same-process 3-way A/B at the bench shape:
  A: Q=192 (fused middle, explicit exchange transposes)  [current default]
  B: Q=256 strided (transpose-free exchanges)
  C: Q=256 with transposes (attribution: quota growth alone)
Each variant builds its own EmV4Data; fns compiled once, timed in
interleaved reps."""

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

VARIANTS = [
    ("A Q192+transpose", {"OARFISH_ROUTE_Q128": "0"}),
    ("B Q256+strided", {"OARFISH_ROUTE_Q128": "1"}),
    ("C Q256+transpose", {"OARFISH_ROUTE_Q128": "1",
                          "OARFISH_V4_NO_STRIDED": "1"}),
]


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
    built = []
    cache = {}
    for label, env in VARIANTS:
        for k in ("OARFISH_ROUTE_Q128", "OARFISH_V4_NO_STRIDED"):
            os.environ.pop(k, None)
        os.environ.update(env)
        key = env.get("OARFISH_ROUTE_Q128", "0")
        if key not in cache:
            t0 = time.perf_counter()
            cache[key] = EmV4Data.build(txp_id, w, boundaries, T)[0]
            pa = cache[key].p_a
            print(f"{label}: build {time.perf_counter() - t0:.0f}s "
                  f"Q={pa.Q} R1={pa.R1}", flush=True)
        data = cache[key]
        f1, f2 = make_fns(data, init)
        # jit traces lazily: force trace+compile NOW, while this
        # variant's env (read at trace time) is still set
        np.asarray(f1(data))
        np.asarray(f2(data))
        built.append((label, data, f1, f2))
    timings = {lbl: [] for lbl, *_ in built}
    for _rep in range(3):
        for label, data, f1, f2 in built:
            d = []
            for f in (f1, f2):
                out = f(data)
                t0 = time.perf_counter()
                np.asarray(out)
                d.append(time.perf_counter() - t0)
            ms = (d[1] - d[0]) / (N2 - N1) * 1e3
            timings[label].append(ms)
            print(f"{label}: {ms:.2f} ms/iter", flush=True)
    for lbl, ts in timings.items():
        print(f"{lbl}: min {min(ts):.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
