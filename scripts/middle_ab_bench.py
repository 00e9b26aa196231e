"""A/B the fused middle kernel (route-A reduce + denom segment sums +
scaling + route-B expand in one pallas program, OARFISH_V4_NO_MIDDLE)
in ONE process at the bench shape. Build once; (N2-N1)-iter deltas."""

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
    print(f"A={A} build {time.perf_counter() - t0:.0f}s "
          f"middle_available={data.seg_id is not None}", flush=True)
    init = jnp.full(T, 10.0, dtype=jnp.float32)
    for nomid, label in [
        ("1", "unfused middle (2 routes + HBM row sums)"),
        ("0", "fused middle kernel"),
        ("1", "unfused middle (repeat)"),
        ("0", "fused middle (repeat)"),
    ]:
        os.environ["OARFISH_V4_NO_MIDDLE"] = nomid
        time_variant(data, init, label)


if __name__ == "__main__":
    main()
