"""A/B the route chunk size CR (OARFISH_FORCE_CR) in ONE process at the
bench shape. The cost model (3*area + vpu, route_config) picked CR=256;
at CR=512 both the quota area and the static table traffic shrink ~25%
while per-chunk gather work rises ~50% — only a measurement settles it.
Each variant REBUILDS the layout (placement balances at the chosen CR).
100-iter deltas."""

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
    init = jnp.full(T, 10.0, dtype=jnp.float32)
    order = sys.argv[1:] or ["256", "512", "128", "256"]
    for cr in order:
        os.environ["OARFISH_FORCE_CR"] = cr
        t0 = time.perf_counter()
        data, _ = EmV4Data.build(txp_id, w, boundaries, T)
        pa = data.p_a
        print(
            f"CR={cr}: build {time.perf_counter()-t0:.0f}s "
            f"n_src={pa.n_src} Q={pa.Q} R1={pa.R1} "
            f"area={pa.n_src*pa.n_dst*pa.Q/1e6:.1f}M",
            flush=True,
        )
        time_variant(data, init, f"CR={cr}")


if __name__ == "__main__":
    main()
