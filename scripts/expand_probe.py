"""Why does route A's expand stage cost 1.24 ms/iter (stage split
2026-08-18) when the fused middle — which runs TWO gather-network
stages plus the butterfly — costs 0.24 ms? A/B the expand kernel at the
bench shape over: chunks-per-program cap, fused mul on/off, and CR=128
(H_in=1) vs CR=256 (H_in=2) geometries on the SAME layout.

Plans are passed as jit ARGUMENTS (closure capture inlines the tables
into the HLO and the remote compiler rejects big modules with HTTP 413).
Same-process deltas only; N2-N1 = 100.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench
from oarfish_tpu.ops.em_v4 import EmV4Data, route_config
from oarfish_tpu.ops.static_permute import (
    LANES,
    GlobalRoute,
    _run_route_stage,
    route_maxflow,
    select_route_geometry,
)

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


def expand_fn(n, with_mul):
    def f(plan, x, mul):
        def body(i, s):
            y1 = plan.expand_y1(x * (1.0 + 0.0 * s),
                                mul=mul if with_mul else None)
            return y1[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return f


def main():
    txp_id, w, boundaries, read_id, A = bench.make_csr()
    T = bench.T
    t0 = time.perf_counter()
    data, _order, dbg = EmV4Data.build(txp_id, w, boundaries, T,
                                       debug=True)
    print(f"build {time.perf_counter() - t0:.0f}s", flush=True)
    p = data.p_a
    print(f"CR={p.chunk_rows} n_src={p.n_src} Q={p.Q} R1={p.R1}",
          flush=True)
    npad = p.n_src * p.chunk_rows * LANES
    x = jnp.asarray(np.random.default_rng(0).random(npad),
                    jnp.float32)
    mul = data.w_txp

    # default config (CR=256, cpp auto<=8), mul fused
    delta_time(lambda n: expand_fn(n, True), "CR256 cpp-auto +mul",
               p, x, mul)
    delta_time(lambda n: expand_fn(n, False), "CR256 cpp-auto -mul",
               p, x, mul)

    for cap in (1, 2, 8):
        os.environ["OARFISH_ROUTE_CPP_CAP"] = str(cap)
        _run_route_stage.clear_cache()
        delta_time(lambda n: expand_fn(n, True), f"CR256 cpp={cap} +mul",
                   p, x, mul)
    os.environ.pop("OARFISH_ROUTE_CPP_CAP", None)
    _run_route_stage.clear_cache()

    # CR=128 geometry on the same slot maps (H_in=1 expand)
    slot = dbg["slot_of_aln"]
    tslot = dbg["txp_slot_of_aln"]
    mf = route_maxflow(slot, tslot, npad, chunk=128 * LANES)
    npd, Q = select_route_geometry(npad // (128 * LANES), mf, q128=True)
    print(f"CR128 geometry: npd={npd} Q={Q} mf={mf} "
          f"area={npd * npd * Q / 1e6:.1f}M "
          f"(CR256 area={p.n_src * p.n_dst * p.Q / 1e6:.1f}M)",
          flush=True)
    R1 = npd * Q // LANES
    if R1 % LANES or R1 // LANES > 16:
        print("CR128 infeasible (H too big)", flush=True)
        return
    t0 = time.perf_counter()
    g128 = GlobalRoute(slot, tslot, npad, force_geometry=(npd, Q),
                       chunk_rows=128)
    print(f"CR128 build {time.perf_counter() - t0:.0f}s", flush=True)
    delta_time(lambda n: expand_fn(n, True), "CR128 cpp-auto +mul",
               g128.plan, x, mul)
    delta_time(lambda n: expand_fn(n, False), "CR128 cpp-auto -mul",
               g128.plan, x, mul)


if __name__ == "__main__":
    main()
