"""A/B the per-program VMEM budget (OARFISH_ROUTE_VMEM_MB) that gates
chunk-per-program batching in the route + middle kernels, in ONE process
at the bench shape. Higher budgets allow more chunks per grid program
(fewer programs, fewer strided-DMA descriptors per program issue), at
the risk of worse double-buffer overlap. 100-iter deltas."""

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
from oarfish_tpu.ops import static_permute as sp

N1, N2 = 20, 120


def time_variant(data, init, label):
    # env knobs act at trace time: drop every cached trace first
    sp._run_route_stage.clear_cache()
    sp._run_middle_stage.clear_cache()

    def make(n):
        def f(d):
            def body(i, prev):
                return _m_step_v4(d, prev, None) * 0.5 + prev * 0.5
            return jax.lax.fori_loop(0, n, body, init)
        return f

    f1, f2 = jax.jit(make(N1)), jax.jit(make(N2))
    d = []
    for f in (f1, f2, f1, f2):
        out = f(data)
        t0 = time.perf_counter()
        np.asarray(out)
        d.append(time.perf_counter() - t0)
    d1, d2 = min(d[0], d[2]), min(d[1], d[3])
    ms = (d2 - d1) / (N2 - N1) * 1e3
    print(f"{label}: {ms:.2f} ms/iter (d1={d1:.2f} d2={d2:.2f})",
          flush=True)


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    t0 = time.perf_counter()
    data, _ = EmV4Data.build(txp_id, w, boundaries, T)
    print(f"A={A} build {time.perf_counter() - t0:.0f}s", flush=True)
    init = jnp.full(T, 10.0, dtype=jnp.float32)
    import json

    variants = os.environ.get("OARFISH_AB_VARIANTS")
    if variants:
        plan = json.loads(variants)  # [[mb|null, cap|null, label], ...]
    else:
        plan = [
            (None, None, "default (4MB, cap 4/8)"),
            ("8", "8", "8MB, cap 8"),
            ("16", "16", "16MB, cap 16"),
            (None, None, "default again"),
        ]
    for mb, cap, label in plan:
        if mb is None:
            os.environ.pop("OARFISH_ROUTE_VMEM_MB", None)
        else:
            os.environ["OARFISH_ROUTE_VMEM_MB"] = mb
        if cap is None:
            os.environ.pop("OARFISH_ROUTE_CPP_CAP", None)
        else:
            os.environ["OARFISH_ROUTE_CPP_CAP"] = cap
        time_variant(data, init, label)


if __name__ == "__main__":
    main()
