"""Decompose the fused middle kernel's 1.15 ms/iter (stage split
2026-08-18): how much is the sublane butterfly (currently always
max_lvl steps on every chunk), the strided quota read, and the two
gather-network stages? Same-process deltas; data passed as jit args.

  M0 current middle (max_lvl global)
  M1 max_lvl=0 (butterfly off; wrong denominators, timing only)
  M2 max_lvl=2 (what most chunks would need if split per bucket)
  M3 pre-transposed input (strided_qr=0), transpose INCLUDED in loop
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import EmV4Data
from oarfish_tpu.ops.gather_pallas import LANES
from oarfish_tpu.ops.static_permute import _run_middle_stage

N1, N2 = 20, 120


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
    data, _ = EmV4Data.build(txp_id, w, boundaries, T)
    pa, pb = data.p_a, data.p_b
    qr = pa.Q // LANES
    max_lvl = max(
        (int(K).bit_length() - 1 for _rp, K in data.read_shapes),
        default=0,
    )
    print(f"max_lvl={max_lvl} read_shapes={data.read_shapes}",
          flush=True)
    rng = np.random.default_rng(0)
    y1 = jnp.asarray(
        rng.random((pa.n_src * pa.R1, LANES)), jnp.float32
    )

    def mk(lvl, strided):
        def make(n):
            def f(d, y1v):
                paq, pbq = d.p_a, d.p_b

                def body(i, s):
                    y = y1v * (1.0 + 0.0 * s)
                    if strided:
                        zg = y.reshape(paq.n_src, paq.n_dst, qr, LANES)
                        sq = qr
                    else:
                        zg = jnp.transpose(
                            y.reshape(paq.n_src, paq.n_dst, paq.Q),
                            (1, 0, 2),
                        ).reshape(paq.n_dst * paq.R3, LANES)
                        sq = 0
                    out = _run_middle_stage(
                        zg, d.seg_id, paq.s3_r1, paq.s3_src, paq.s3_row,
                        paq.s3_r2, paq.s3_mask, pbq.s1_r1, pbq.s1_src,
                        pbq.s1_row, pbq.s1_r2, n_chunks=paq.n_dst,
                        R_q=paq.R3, R_c=paq.chunk_rows, thresh=1e-24,
                        max_lvl=lvl, strided_qr=sq,
                    )
                    return out[0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            return f

        return make

    delta_time(mk(max_lvl, True), "M0 current", data, y1)
    delta_time(mk(0, True), "M1 lvl=0", data, y1)
    delta_time(mk(2, True), "M2 lvl=2", data, y1)
    delta_time(mk(max_lvl, False), "M3 pre-transposed", data, y1)


if __name__ == "__main__":
    main()
