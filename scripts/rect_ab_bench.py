"""Same-process A/B at the bench shape: square Q=256 strided geometry
(the default) vs the rectangular rebuild (OARFISH_RECT=1) (txp 256 x read 384
chunks, Q=128). Each variant builds its own EmV4Data; fns compiled once
under the variant's env, timed interleaved."""

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
    ("A square Q256 strided", {}),
    ("B rect 256x384 Q128", {"OARFISH_RECT": "1"}),
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
    for label, env in VARIANTS:
        os.environ.pop("OARFISH_RECT", None)
        os.environ.update(env)
        t0 = time.perf_counter()
        data, _ = EmV4Data.build(txp_id, w, boundaries, T)
        pa = data.p_a
        print(f"{label}: build {time.perf_counter() - t0:.0f}s "
              f"Q={pa.Q} n_src={pa.n_src} n_dst={pa.n_dst}", flush=True)
        f1, f2 = make_fns(data, init)
        np.asarray(f1(data))  # trace+compile under this env
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
