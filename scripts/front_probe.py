"""Which part of the m-step 'front' (prev -> prev_slots build) costs
~1 ms/iter? (Stage split 2026-08-18: front+expand = 1.28 ms while
expand on a materialized input is 0.30 — the front-only prefix read a
single element, so XLA DCE'd it to 0.04 ms. The 34 MB prev_slots write
should cost ~0.05 ms at HBM speed.)

Variants all feed the real expand kernel (forces materialization):
  v0 expand(const)                 baseline
  v1 expand(front full)            the real front
  v2 expand(front, big part zeros) small-bucket broadcasts only
  v3 expand(front, small zeros)    big-region broadcast only
  v4 expand(zeros-concat shaped)   pure concat/zeros cost
Plans travel as jit args (closure capture -> HTTP 413).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import CAPK, EmV4Data, _row_broadcast
from oarfish_tpu.ops.gather_pallas import LANES

N1, N2 = 10, 110


def delta_time(make_fn, tag, *args):
    try:
        f1, f2 = jax.jit(make_fn(N1)), jax.jit(make_fn(N2))
        d = []
        for f in (f1, f2, f1, f2):
            out = f(*args)
            t0 = time.perf_counter()
            np.asarray(out)
            d.append(time.perf_counter() - t0)
        d1, d2 = min(d[0], d[2]), min(d[1], d[3])
        ms = (d2 - d1) / (N2 - N1) * 1e3
        print(f"{tag}: {ms:.3f} ms/iter (d1={d1:.2f}s d2={d2:.2f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    data, _order = EmV4Data.build(txp_id, w, boundaries, T)
    p = data.p_a
    npad = p.n_src * p.chunk_rows * LANES
    print(f"npad={npad} n_slots_t={data.n_slots_t} "
          f"small={data.row_space_s * 1} big_rows={data.big_rows_pad} "
          f"big_slots={data.big_rows_pad * CAPK} "
          f"n_small_slots={data.n_slots_t - data.big_rows_pad * CAPK}",
          flush=True)

    def front(prev, mode):
        dt = prev.dtype
        ext = jnp.zeros(data.t_space, dt).at[:T].set(prev)
        pr = data.t_in(ext)
        pr_small = pr[: data.row_space_s]
        pr_big = pr[data.row_space_s : data.row_space_s + data.n_big]
        n_small_slots = data.n_slots_t - data.big_rows_pad * CAPK
        if mode in ("full", "smallonly"):
            parts = [_row_broadcast(pr_small, data.small_shapes)]
        else:
            parts = [jnp.zeros(n_small_slots, dt) * prev[0]]
        if data.big_rows_pad:
            if mode in ("full", "bigonly"):
                pr_rows = jnp.take(pr_big, data.big_row_of_txp)
                g = data.big_rows_pad // LANES
                parts.append(
                    jnp.broadcast_to(
                        pr_rows.reshape(g, 1, LANES), (g, CAPK, LANES)
                    ).reshape(-1)
                )
            else:
                parts.append(
                    jnp.zeros(data.big_rows_pad * CAPK, dt) * prev[0]
                )
        if npad > data.n_slots_t:
            parts.append(jnp.zeros(npad - data.n_slots_t, dt))
        return jnp.concatenate(parts)

    def make(mode):
        def mk(n):
            def f(plan, prev, mul):
                def body(i, s):
                    pv = prev * (1.0 + 0.0 * s)
                    if mode == "const":
                        x = jnp.broadcast_to(
                            pv[0], (npad,)
                        ) * 1.0
                    elif mode == "zeroshape":
                        x = front(pv, "zeros")
                    else:
                        x = front(pv, mode)
                    y1 = plan.expand_y1(x, mul=mul)
                    return y1[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return f
        return mk

    init = jnp.full(T, 10.0, jnp.float32)
    mul = data.w_txp
    delta_time(make("const"), "v0 expand(const)", p, init, mul)
    delta_time(make("full"), "v1 expand(front full)", p, init, mul)
    delta_time(make("smallonly"), "v2 small-bcast only", p, init, mul)
    delta_time(make("bigonly"), "v3 big-bcast only", p, init, mul)
    delta_time(make("zeroshape"), "v4 zero parts concat", p, init, mul)


if __name__ == "__main__":
    main()
