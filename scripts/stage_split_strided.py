"""Stage attribution for the CURRENT default m-step (fused middle +
strided transpose-free exchanges) at the bench shape: cumulative-prefix
fori_loops, (N2-N1)-iter deltas, successive differences = per-stage
cost. Same-process only; `data` travels as a jit ARGUMENT (closure
capture inlines the routing tables into the HLO — the remote compiler
rejects big modules with HTTP 413, and constant-folding skews timings).

Caveat from the 2026-08-18 session: a prefix whose tail output is only
partially read gets aggressively DCE'd (the front-only prefix read one
element and measured 0.04 ms for work that costs ~0.2 when a pallas
consumer forces materialization). Every prefix here therefore ends by
feeding its value into the next real kernel OR by a full-array
reduction, and the reduction-only prefixes are marked LOWER BOUNDS.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import (
    CAPK,
    EmV4Data,
    _m_step_v4,
    _row_broadcast,
    _row_sums,
)
from oarfish_tpu.ops.gather_pallas import LANES
from oarfish_tpu.ops.static_permute import _run_middle_stage

N1, N2 = 20, 120


def build_prefixes(T):
    def front(data, prev):
        dt = prev.dtype
        npad = data.p_a.n_src * data.p_a.chunk_rows * LANES
        ext = jnp.zeros(data.t_space, dt).at[:T].set(prev)
        pr = data.t_in(ext)
        pr_small = pr[: data.row_space_s]
        pr_big = pr[data.row_space_s : data.row_space_s + data.n_big]
        parts = [_row_broadcast(pr_small, data.small_shapes)]
        if data.big_rows_pad:
            pr_rows = jnp.take(pr_big, data.big_row_of_txp)
            g = data.big_rows_pad // LANES
            parts.append(
                jnp.broadcast_to(
                    pr_rows.reshape(g, 1, LANES), (g, CAPK, LANES)
                ).reshape(-1)
            )
        if npad > data.n_slots_t:
            parts.append(jnp.zeros(npad - data.n_slots_t, dt))
        return jnp.concatenate(parts)

    def expand(data, prev):
        return data.p_a.expand_y1(front(data, prev), mul=data.w_txp)

    def middle(data, prev):
        pa, pb = data.p_a, data.p_b
        qr = pa.Q // LANES
        max_lvl = max(
            (int(K).bit_length() - 1 for _rp, K in data.read_shapes),
            default=0,
        )
        y1 = expand(data, prev)
        zg = y1.reshape(pa.n_src, pa.n_dst, qr, LANES)
        return _run_middle_stage(
            zg, data.seg_id, pa.s3_r1, pa.s3_src, pa.s3_row, pa.s3_r2,
            pa.s3_mask, pb.s1_r1, pb.s1_src, pb.s1_row, pb.s1_r2,
            n_chunks=pa.n_dst, R_q=pa.R3, R_c=pa.chunk_rows,
            thresh=1e-24, max_lvl=max_lvl, strided_qr=qr,
        )

    def reduce(data, prev):
        return data.p_b.reduce_strided(middle(data, prev), sliced=False)

    def back(data, prev):
        return _m_step_v4(data, prev, None)

    return [
        ("front+expand A (LB: front alone DCEs)", expand),
        ("+ fused middle (strided reads)", middle),
        ("+ reduce_strided B", reduce),
        ("+ row sums + t_out (full m-step)", back),
    ]


def time_prefix(fn, data, init, label, prev_ms):
    def make(n):
        def f(d, p0):
            def body(i, s):
                out = fn(d, p0 * (1.0 + 0.0 * s))
                return out.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(1.0))
        return f

    f1, f2 = jax.jit(make(N1)), jax.jit(make(N2))
    d = []
    for f in (f1, f2, f1, f2):
        out = f(data, init)
        t0 = time.perf_counter()
        np.asarray(out)
        d.append(time.perf_counter() - t0)
    d1, d2 = min(d[0], d[2]), min(d[1], d[3])
    ms = (d2 - d1) / (N2 - N1) * 1e3
    print(f"{label}: {ms:.3f} ms/iter (stage {ms - prev_ms:+.3f})",
          flush=True)
    return ms


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    t0 = time.perf_counter()
    data, _ = EmV4Data.build(txp_id, w, boundaries, T)
    print(f"build {time.perf_counter() - t0:.0f}s Q={data.p_a.Q}",
          flush=True)
    init = jnp.full(T, 10.0, dtype=jnp.float32)
    prev_ms = 0.0
    for label, fn in build_prefixes(T):
        prev_ms = time_prefix(fn, data, init, label, prev_ms)


if __name__ == "__main__":
    main()
