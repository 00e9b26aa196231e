"""Same-process A/B at the bench shape: route chunk size CR=256
(cost-model default, q128-upgraded to (256,256)=16.8M quota elements)
vs CR=512 whose NATURAL geometry (128, Q>=mf rounded to 128) is already
lane-tile aligned — strided exchange with zero area inflation (12.6M).
The route_config cost model compares PLAIN geometries before the q128
upgrade, which biases it toward CR=256; this measures the truth."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import EmV4Data, _m_step_v4, _v4_layout, LANES
from oarfish_tpu.ops.static_permute import route_maxflow

N1, N2 = 20, 120


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

    lay = _v4_layout(txp_id, w, boundaries, T)
    NPAD = lay["NPAD"]
    variants = [("A CR=256 default", None)]
    from oarfish_tpu.ops.static_permute import select_route_geometry

    for CR in (512,):
        CHR = CR * LANES
        npad_r = ((NPAD + CHR - 1) // CHR) * CHR
        mf = route_maxflow(lay["slot_of_aln"], lay["txp_slot_of_aln"],
                           npad_r, chunk=CHR)
        npd, Q = select_route_geometry(npad_r // CHR, mf, q128=True)
        variants.append(
            (f"B CR={CR} ({npd},{Q})", (CR, npad_r, (npd, Q)))
        )
    built = []
    for label, geometry in variants:
        t0 = time.perf_counter()
        data, _ = EmV4Data.build(txp_id, w, boundaries, T,
                                 geometry=geometry)
        pa = data.p_a
        print(f"{label}: build {time.perf_counter() - t0:.0f}s "
              f"CR={pa.chunk_rows} npd={pa.n_src} Q={pa.Q} "
              f"area={pa.n_src * pa.n_dst * pa.Q / 1e6:.1f}M", flush=True)
        f1, f2 = make_fns(data, init)
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
