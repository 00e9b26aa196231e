"""Stage attribution for the CURRENT default m-step (fused middle +
strided transpose-free exchanges) at the bench shape: cumulative-prefix
fori_loops, (N2-N1)-iter deltas, successive differences = per-stage
cost. Same-process only."""

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
    _row_broadcast,
    _row_sums,
)
from oarfish_tpu.ops.gather_pallas import LANES
from oarfish_tpu.ops.static_permute import _run_middle_stage

N1, N2 = 20, 120


def build_prefixes(data, T):
    pa, pb = data.p_a, data.p_b
    npad = pa.n_src * pa.chunk_rows * LANES
    qr = pa.Q // LANES
    assert qr * LANES == pa.Q, "strided path requires Q % 128 == 0"
    max_lvl = max(
        (int(K).bit_length() - 1 for _rp, K in data.read_shapes),
        default=0,
    )

    def front(prev):
        dt = prev.dtype
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

    def expand(prev):
        return pa.expand_y1(front(prev), mul=data.w_txp)

    def middle(prev):
        y1 = expand(prev)
        zg = y1.reshape(pa.n_src, pa.n_dst, qr, LANES)
        return _run_middle_stage(
            zg, data.seg_id, pa.s3_r1, pa.s3_src, pa.s3_row, pa.s3_r2,
            pa.s3_mask, pb.s1_r1, pb.s1_src, pb.s1_row, pb.s1_r2,
            n_chunks=pa.n_dst, R_q=pa.R3, R_c=pa.chunk_rows,
            thresh=1e-24, max_lvl=max_lvl, strided_qr=qr,
        )

    def reduce(prev):
        return pb.reduce_strided(middle(prev), sliced=False)

    def back(prev):
        dt = prev.dtype
        inc_t = reduce(prev)
        small_sums = _row_sums(inc_t, data.small_shapes,
                               data.small_starts)
        if data.big_rows_pad:
            g = data.big_rows_pad // LANES
            big_base = data.n_slots_t - data.big_rows_pad * CAPK
            big_rows = inc_t[
                big_base : data.n_slots_t
            ].reshape(g, CAPK, LANES).sum(axis=1).reshape(-1)
            cs = jnp.concatenate(
                [jnp.zeros(1, dt), jnp.cumsum(big_rows)]
            )
            o = data.big_row_offsets
            big_sums = jnp.take(cs, o[1:]) - jnp.take(cs, o[:-1])
            v = jnp.concatenate([small_sums, big_sums])
        else:
            v = small_sums
        vv = jnp.zeros(data.t_space, dt).at[: v.shape[0]].set(v)
        return data.t_out(vv)[:T]

    return [
        ("front (t_in + prev_slots build)", front),
        ("+ expand_y1 A (stage1, fused *w)", expand),
        ("+ fused middle (strided reads)", middle),
        ("+ reduce_strided B", reduce),
        ("+ row sums + t_out (full m-step)", back),
    ]


def time_prefix(fn, init, label, prev_ms):
    def make(n):
        def f(p0):
            def body(i, s):
                out = fn(p0 * (1.0 + 0.0 * s))
                return out.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(1.0))
        return f

    f1, f2 = jax.jit(make(N1)), jax.jit(make(N2))
    d = []
    for f in (f1, f2, f1, f2):
        out = f(init)
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
    for label, fn in build_prefixes(data, T):
        prev_ms = time_prefix(fn, init, label, prev_ms)


if __name__ == "__main__":
    main()
