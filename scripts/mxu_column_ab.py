"""VERDICT r2 item 3 A/B: can the route kernels' column stage leave
the VPU?

The per-stage roofline (PERF_NOTES "round 2") shows all three route
stages at 36-40% HBM efficiency — VPU-bound on the shuffle chain in
`_stage_apply` (static_permute.py:579). Two levers were named but not
measured at the current geometry:

  (1) MXU one-hot column-stage offload: replace the H_in x H_out
      transpose + gather + select delivery with one-hot [128,128]
      matmuls built in-kernel by iota compare. IMPORTANT SEMANTIC
      LIMIT: the real column stage is a PER-LANE row permutation
      (row[c, r'] varies with channel c — DeviceTilePlan.col_lane), so
      a [128,128] matmul can only express it if the tables are
      lane-INVARIANT, which the Euler-coloring layout does not produce.
      This A/B therefore measures the CYCLE TRADE of the MXU
      formulation on lane-invariant surrogate tables with identical
      shapes/traffic: if the MXU variant is not decisively faster than
      the VPU path, the lever is dead regardless of the (large) layout
      work a lane-invariant constraint would need. Both variants are
      validated to produce IDENTICAL outputs on lane-invariant tables.

  (2) Coarser factorization bound: a gather-only variant (no src
      compare+select, single source block per output block — the
      semantics a block-diagonal-constrained layout would allow) upper-
      bounds what ANY factorization with fewer per-element vreg ops
      could buy within the take_along_axis delivery scheme. (It reads
      ~7% less table traffic — src tables dropped — which only favors
      the bound.)

Geometry = the bench stage-1 shape: n_chunks=256, R_in=256 (H_in=2),
R_out=512 (H_out=4), f32 values, i8 tables, same BlockSpecs and
program batching as `_run_route_stage`. Timing: same-process
delta-timing (N2-N1 loop-length difference; host transfer syncs) per
CLAUDE.md tunnel rules.

Usage: python scripts/mxu_column_ab.py [--chunks 256] [--check-only]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from oarfish_tpu.ops.gather_pallas import LANES, _interpret
from oarfish_tpu.ops.static_permute import (
    _chunks_per_program,
    _stage_apply,
)

N1, N2 = 20, 120


# ---------------------------------------------------------------------------
# kernel bodies (per chunk j). All take the same refs as the real
# stage-1 kernel: x [cpp*R_in,128] f32, r1 [cpp,R_in,128] i8,
# src/row [cpp,H_out,128,128] i8, r2 [cpp,R_out,128] i8.
# ---------------------------------------------------------------------------

def _body_vpu(x, r1, src, row, r2, H_in, H_out):
    return _stage_apply(x, r1, src, row, r2, None, H_in, H_out)


def _body_mxu(x, r1, src, row, r2, H_in, H_out):
    """One-hot MXU delivery (lane-invariant semantics): Y_ho =
    sum_hi (ST_ho_hi)^T @ X_hi with ST[r, r'] = (row0[r'] == r) &&
    (src0[r'] == hi), built by broadcasted-iota compare. No transposes;
    the MXU contracts over the input-row axis directly (A^T B form)."""
    s1 = jnp.take_along_axis(x, r1.astype(jnp.int32), axis=1)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    outs = []
    for ho in range(H_out):
        # lane-invariant surrogate: sublane 0 of the table, broadcast
        row0 = jnp.broadcast_to(
            row[ho, 0:1, :].astype(jnp.int32), (LANES, LANES)
        )
        src0 = jnp.broadcast_to(
            src[ho, 0:1, :].astype(jnp.int32), (LANES, LANES)
        )
        sel_r = (row0 == iota_sub)
        acc = jnp.zeros((LANES, LANES), s1.dtype)
        for hi in range(H_in):
            st = jnp.where(
                sel_r & (src0 == hi), jnp.float32(1.0), jnp.float32(0.0)
            )
            xh = s1[hi * LANES : (hi + 1) * LANES, :]
            acc = acc + jax.lax.dot_general(
                st, xh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        outs.append(acc)
    q = jnp.concatenate(outs, axis=0)
    return jnp.take_along_axis(q, r2.astype(jnp.int32), axis=1)


def _body_gat(x, r1, src, row, r2, H_in, H_out):
    """Gather-only bound: single-source delivery (no src select) — the
    cost a block-diagonal layout constraint would leave behind."""
    s1 = jnp.take_along_axis(x, r1.astype(jnp.int32), axis=1)
    blocks = [s1[h * LANES : (h + 1) * LANES, :].T for h in range(H_in)]
    outs = []
    for ho in range(H_out):
        g = jnp.take_along_axis(
            blocks[ho % H_in], row[ho].astype(jnp.int32), axis=1
        )
        outs.append(g.T)
    q = jnp.concatenate(outs, axis=0)
    return jnp.take_along_axis(q, r2.astype(jnp.int32), axis=1)


def make_kernel(body, H_in, H_out, cpp, with_src):
    R_in, R_out = H_in * LANES, H_out * LANES

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        r1_ref = next(it)
        src_ref = next(it) if with_src else None
        row_ref = next(it)
        r2_ref = next(it)
        out_ref = next(it)
        for j in range(cpp):
            out = body(
                x_ref[j * R_in : (j + 1) * R_in, :],
                r1_ref[j],
                None if src_ref is None else src_ref[j],
                row_ref[j],
                r2_ref[j],
                H_in, H_out,
            )
            out_ref[j * R_out : (j + 1) * R_out, :] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "n_chunks",
                                             "H_in", "H_out"))
def run_stage(x, r1, src, row, r2, variant, n_chunks, H_in, H_out):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R_in, R_out = H_in * LANES, H_out * LANES
    with_src = variant != "gat"
    per_chunk = (
        R_in * LANES * 4 + R_in * LANES
        + (H_out * LANES * LANES if with_src else 0)
        + H_out * LANES * LANES + R_out * LANES + R_out * LANES * 4
    )
    cap = 8 if H_in * H_out <= 8 else 4
    cpp = _chunks_per_program(n_chunks, per_chunk, cap=cap)
    specs = [
        pl.BlockSpec((cpp * R_in, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cpp, R_in, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, r1]
    if with_src:
        specs.append(pl.BlockSpec((cpp, H_out, LANES, LANES),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(src)
    specs.append(pl.BlockSpec((cpp, H_out, LANES, LANES),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM))
    args.append(row)
    specs.append(pl.BlockSpec((cpp, R_out, LANES), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM))
    args.append(r2)
    body = {"vpu": _body_vpu, "mxu": _body_mxu, "gat": _body_gat}[variant]
    return pl.pallas_call(
        make_kernel(body, H_in, H_out, cpp, with_src),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((n_chunks * R_out, LANES),
                                       jnp.float32),
        grid=(n_chunks // cpp,),
        in_specs=specs,
        out_specs=pl.BlockSpec((cpp * R_out, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*args)


def make_tables(rng, n_chunks, H_in, H_out, lane_invariant):
    R_in, R_out = H_in * LANES, H_out * LANES
    r1 = rng.integers(0, LANES, (n_chunks, R_in, LANES), dtype=np.int8)
    r2 = rng.integers(0, LANES, (n_chunks, R_out, LANES), dtype=np.int8)
    if lane_invariant:
        row = np.broadcast_to(
            rng.integers(0, LANES, (n_chunks, H_out, 1, LANES)),
            (n_chunks, H_out, LANES, LANES),
        ).astype(np.int8).copy()
        src = np.broadcast_to(
            rng.integers(0, H_in, (n_chunks, H_out, 1, LANES)),
            (n_chunks, H_out, LANES, LANES),
        ).astype(np.int8).copy()
    else:
        row = rng.integers(0, LANES, (n_chunks, H_out, LANES, LANES),
                           dtype=np.int8)
        src = rng.integers(0, H_in, (n_chunks, H_out, LANES, LANES),
                           dtype=np.int8)
    return r1, src, row, r2


def timed(variant, x, tabs, n_chunks, H_in, H_out):
    def make(n):
        def f(xv, r1, src, row, r2):
            def body(i, s):
                out = run_stage(xv * (1.0 + 0.0 * s), r1, src, row, r2,
                                variant=variant, n_chunks=n_chunks,
                                H_in=H_in, H_out=H_out)
                return out.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(1.0))
        return f

    f1, f2 = jax.jit(make(N1)), jax.jit(make(N2))
    d = []
    for f in (f1, f2, f1, f2):
        out = f(x, *tabs)
        t0 = time.perf_counter()
        np.asarray(out)
        d.append(time.perf_counter() - t0)
    d1, d2 = min(d[0], d[2]), min(d[1], d[3])
    return (d2 - d1) / (N2 - N1) * 1e3


def main():
    from oarfish_tpu.cli import enable_persistent_jax_cache

    enable_persistent_jax_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=256)
    ap.add_argument("--hin", type=int, default=2)
    ap.add_argument("--hout", type=int, default=4)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    n_chunks, H_in, H_out = args.chunks, args.hin, args.hout
    R_in = H_in * LANES

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(n_chunks * R_in, LANES)).astype(np.float32)
    )

    # correctness: on lane-invariant tables, vpu and mxu must agree
    tabs_li = tuple(map(jnp.asarray,
                        make_tables(rng, n_chunks, H_in, H_out, True)))
    o_vpu = np.asarray(run_stage(x, *tabs_li, variant="vpu",
                                 n_chunks=n_chunks, H_in=H_in,
                                 H_out=H_out))
    o_mxu = np.asarray(run_stage(x, *tabs_li, variant="mxu",
                                 n_chunks=n_chunks, H_in=H_in,
                                 H_out=H_out))
    err = float(np.max(np.abs(o_vpu - o_mxu)))
    print(f"lane-invariant agreement: max |vpu-mxu| = {err:.3e}",
          flush=True)
    assert err < 1e-5, "MXU one-hot variant disagrees with the VPU path"
    if args.check_only:
        return

    # timing on REAL-shaped (lane-varying) tables for vpu/gat; mxu uses
    # the same arrays (it reads sublane 0 only — traffic identical)
    tabs = tuple(map(jnp.asarray,
                     make_tables(rng, n_chunks, H_in, H_out, False)))
    results = {}
    for variant in ("vpu", "mxu", "gat"):
        ms = timed(variant, x, tabs, n_chunks, H_in, H_out)
        results[variant] = ms
        print(f"{variant}: {ms:.3f} ms/iter "
              f"(chunks={n_chunks}, H_in={H_in}, H_out={H_out})",
              flush=True)
    print(
        f"mxu/vpu = {results['mxu'] / results['vpu']:.2f}x, "
        f"gat/vpu = {results['gat'] / results['vpu']:.2f}x "
        f"(gat = headroom bound for any fewer-vreg-op factorization)",
        flush=True,
    )


if __name__ == "__main__":
    main()
