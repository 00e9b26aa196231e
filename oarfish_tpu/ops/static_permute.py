"""Device kernels applying STATIC permutations to `[R,128]` tiles.

Composes the three-stage decomposition from `permute_plan.py` out of the
ops Mosaic actually supports (PERF_NOTES.md): the 128-lane row shuffle
(`take_along_axis` axis 1), 128x128 transposes, and elementwise selects.
The column stage (independent row-permutation per column) is realized in
transposed space: for each (dst-block, src-block) pair of 128-row blocks,
a static row-gather of the transposed source block delivers the needed
elements, and static masks merge the contributions.

All routing arrays are static (built once at pack time); the kernel is a
fixed sequence of VPU-speed ops.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .permute_plan import LANES, TilePermutePlan


@dataclass(frozen=True)
class DeviceTilePlan:
    """Static arrays for the device kernel. H = R/128 row blocks."""

    r1: np.ndarray  # [R,128] i32
    r2: np.ndarray  # [R,128] i32
    col_lane: np.ndarray  # [H, H, 128, 128] i32  (dst block, src block)
    col_mask: np.ndarray  # [H, H, 128, 128] bool
    rows: int

    @staticmethod
    def build(perm: np.ndarray, rows: int) -> "DeviceTilePlan":
        base = TilePermutePlan.build(perm, rows)
        R = rows
        H = R // LANES
        assert R % LANES == 0
        col_lane = np.zeros((H, H, LANES, LANES), dtype=np.int32)
        col_mask = np.zeros((H, H, LANES, LANES), dtype=bool)
        # base.col_perm[r, c] = source row feeding (r, c) after the column
        # stage. In transposed space: out block hd at (c, r'_d) pulls from
        # T_src[c, r'_s] of block hs.
        src_row = base.col_perm  # [R, 128]
        for hd in range(H):
            rs = src_row[hd * LANES : (hd + 1) * LANES, :]  # [128(r'_d),128(c)]
            hs_of = rs // LANES
            ls_of = rs % LANES
            for hs in range(H):
                m = hs_of == hs  # [r'_d, c]
                # transposed-space indices: [c, r'_d]
                col_mask[hd, hs] = m.T
                col_lane[hd, hs] = np.where(m, ls_of, 0).T
        return DeviceTilePlan(
            r1=base.r1.astype(np.int32),
            r2=base.r2.astype(np.int32),
            col_lane=col_lane,
            col_mask=col_mask,
            rows=R,
        )

    def apply_numpy(self, x: np.ndarray) -> np.ndarray:
        """Reference application mirroring the device op sequence."""
        R, H = self.rows, self.rows // LANES
        t = x.reshape(R, LANES)
        s1 = np.take_along_axis(t, self.r1, axis=1)
        blocks = [s1[h * LANES : (h + 1) * LANES].T for h in range(H)]
        out_blocks = []
        for hd in range(H):
            acc = np.zeros((LANES, LANES), dtype=t.dtype)
            for hs in range(H):
                g = np.take_along_axis(blocks[hs], self.col_lane[hd, hs], 1)
                acc = np.where(self.col_mask[hd, hs], g, acc)
            out_blocks.append(acc.T)
        s2 = np.concatenate(out_blocks, axis=0)
        s3 = np.take_along_axis(s2, self.r2, axis=1)
        return s3.reshape(-1)


def _make_kernel(H: int):
    def kernel(x_ref, r1_ref, r2_ref, lane_ref, mask_ref, out_ref):
        s1 = jnp.take_along_axis(x_ref[:, :], r1_ref[0], axis=1)
        blocks = [
            s1[h * LANES : (h + 1) * LANES, :].T for h in range(H)
        ]
        outs = []
        for hd in range(H):
            acc = jnp.zeros((LANES, LANES), s1.dtype)
            for hs in range(H):
                g = jnp.take_along_axis(
                    blocks[hs], lane_ref[0, hd, hs], axis=1
                )
                acc = jnp.where(mask_ref[0, hd, hs], g, acc)
            outs.append(acc.T)
        s2 = jnp.concatenate(outs, axis=0)
        out_ref[:, :] = jnp.take_along_axis(s2, r2_ref[0], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "n_tiles"))
def _run_batch(x, r1, r2, lane, mask, rows, n_tiles):
    """Apply per-tile static permutations to a batch of tiles.
    x: [n_tiles*rows, 128]; routing arrays have a leading tile axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = rows // LANES
    kernel = _make_kernel(H)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, LANES), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H, LANES, LANES), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H, LANES, LANES), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, r1, r2, lane, mask)


def _squeeze_kernel_wrap(kernel):
    return kernel


class BatchTilePermute:
    """A batch of per-tile static permutations, applied in one pallas
    call (grid over tiles)."""

    def __init__(self, plans):
        self.rows = plans[0].rows
        self.n_tiles = len(plans)
        self.r1 = jnp.asarray(np.stack([p.r1 for p in plans]))
        self.r2 = jnp.asarray(np.stack([p.r2 for p in plans]))
        self.lane = jnp.asarray(np.stack([p.col_lane for p in plans]))
        self.mask = jnp.asarray(np.stack([p.col_mask for p in plans]))

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: flat [n_tiles*rows*128] -> permuted flat array."""
        x2 = x.reshape(self.n_tiles * self.rows, LANES)
        out = _run_batch(
            x2, self.r1, self.r2, self.lane, self.mask,
            self.rows, self.n_tiles,
        )
        return out.reshape(-1)
