"""Per-stage delta-timing of the v3 EM iteration on the attached TPU.

Times the full m-step and its expensive sub-stages (sorted gather, P1,
P2) independently at the bench.py workload shape, using the two-loop
delta method (the axon tunnel defers execution; only host transfers
synchronize). Each loop body depends on the carry so nothing is hoisted,
and all plan data travels as jit ARGUMENTS (closure capture inlines it
into the serialized HLO and the remote compiler rejects the module).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v3 import EmV3Data, _m_step_v3
from oarfish_tpu.ops.gather_pallas import LANES, _run as _gather_run

N1, N2 = 8, 24


def delta_time(make_fn, data, tag):
    try:
        f1 = jax.jit(make_fn(N1))
        f2 = jax.jit(make_fn(N2))
        d = []
        for f in (f1, f2, f1, f2):
            out = f(data)
            t0 = time.perf_counter()
            np.asarray(out)
            d.append(time.perf_counter() - t0)
        d1, d2 = min(d[0], d[2]), min(d[1], d[3])
        ms = (d2 - d1) / (N2 - N1) * 1e3
        print(f"{tag}: {ms:.2f} ms/iter  (d1={d1:.2f}s d2={d2:.2f}s)",
              flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    print(f"A={A} T={T}", flush=True)
    t0 = time.perf_counter()
    data, _order = EmV3Data.build(txp_id, w, boundaries, T)
    print(f"build: {time.perf_counter() - t0:.1f}s  "
          f"L={data.w_csc.shape[0]} n_slots={data.n_slots} "
          f"P1(Q={data.p1.Q},R1={data.p1.R1},H={data.p1.R1 // LANES}) "
          f"P2(Q={data.p2.Q},R1={data.p2.R1})", flush=True)
    init = jnp.full(T, 10.0, dtype=jnp.float32)

    def full_loop(n):
        def f(d):
            def body(i, prev):
                return _m_step_v3(d, prev, None) * 0.5 + prev * 0.5
            return jax.lax.fori_loop(0, n, body, init)
        return f

    NPAD = data.p1.n_in
    x0 = jnp.ones(NPAD, jnp.float32)

    def p1_loop(n):
        def f(d):
            def body(i, x):
                return d.p1(x) * 0.999
            return jax.lax.fori_loop(0, n, body, x0)[:8]
        return f

    def p2_loop(n):
        def f(d):
            def body(i, x):
                return d.p2(x) * 0.999
            return jax.lax.fori_loop(0, n, body, x0)[:8]
        return f

    S = data.g_table_rows
    tbl0 = jnp.ones((S, LANES), jnp.float32)

    def gather_loop(n):
        def f(d):
            def body(i, tbl):
                g = _gather_run(tbl, d.g_base, d.g_lane, d.g_hi,
                                d.g_rows, S)
                return tbl * 0.999 + g.reshape(-1)[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, tbl0)[:1, :8]
        return f

    def boundary_loop(n):
        """The cumsum-diff tail alone: tile cumsum + dd prefix + the
        T-sized boundary gathers."""
        from oarfish_tpu.ops.em_fast import TILE, exclusive_tile_prefix

        def f(d):
            def body(i, x):
                x2 = x.reshape(d.num_tiles, TILE)
                local = jnp.cumsum(x2, axis=1)
                g_hi, g_lo = exclusive_tile_prefix(local[:, -1])
                local_flat = jnp.concatenate(
                    [jnp.zeros(1, x.dtype), local.reshape(-1)]
                )

                def prefix_at(pos):
                    tile = pos // TILE
                    hi = jnp.take(g_hi, tile)
                    lo = jnp.take(g_lo, tile)
                    within = jnp.where(pos % TILE == 0, 0.0,
                                       jnp.take(local_flat, pos))
                    return hi, lo + within

                o = d.txp_offsets
                hi2, lo2 = prefix_at(o[1:])
                hi1, lo1 = prefix_at(o[:-1])
                curr = (hi2 - hi1) + (lo2 - lo1)
                return x * 0.999 + curr[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, x0)[:8]
        return f

    delta_time(full_loop, data, "full m-step")
    delta_time(gather_loop, data, "sorted gather")
    delta_time(p1_loop, data, "P1 permute")
    delta_time(p2_loop, data, "P2 permute")
    delta_time(boundary_loop, data, "cumsum-diff + T-gathers")


if __name__ == "__main__":
    main()
