"""Pallas sorted-gather: bandwidth-speed gather of `table[idx]` for a
STATIC, SORTED index array.

XLA lowers every dynamic gather at ~7 ns/element on this chip
(PERF_NOTES.md); Mosaic's only hardware gather is the within-row 128-lane
shuffle (`tpu.dynamic_gather` axis 1). This kernel composes the gather
from supported ops only:

  * the index array is laid out `[rows, 128]` and row-split at pack time
    so each row's index span is < 128 — then every element's value lives
    in one of TWO consecutive rows of the `[S, 128]` table view
    (`t = r*128 + c`);
  * those two table rows are delivered to each output row by a one-hot
    matmul `P @ table` on the MXU (P is a static per-chunk one-hot,
    streamed from HBM);
  * the lane is selected by `take_along_axis(…, axis=1)` — the hardware
    shuffle — with a static lane-index array, and a static mask picks
    between the two candidate rows.

All metadata is static (indices never change across EM iterations), so
the plan is built once at pack time.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
CHUNK_ROWS = 256  # output rows per grid step


@dataclass(frozen=True)
class SortedGatherPlan:
    """Static routing for gathering `table[idx]` (idx sorted)."""

    p0: jax.Array  # [n_rows, S] f32 one-hot of each row's base table-row
    p1: jax.Array  # [n_rows, S] f32 one-hot of base+1
    lane: jax.Array  # [n_rows, 128] i32 lane index
    use_hi: jax.Array  # [n_rows, 128] bool: element lives in base+1
    src_pos: np.ndarray  # [n_rows*128] i64: original position (or -1 pad)
    n_rows: int
    table_rows: int  # S
    out_len: int  # n_rows * 128

    @staticmethod
    def build(idx_sorted: np.ndarray, table_size: int) -> "SortedGatherPlan":
        idx_sorted = np.asarray(idx_sorted, dtype=np.int64)
        A = len(idx_sorted)
        S = (table_size + LANES - 1) // LANES
        # round S up so the MXU contraction dim is a multiple of 8
        S = ((S + 7) // 8) * 8

        # row-split: new 128-element row whenever the span would reach 128.
        # Row-at-a-time greedy (O(n_rows) python iterations, not O(A)).
        starts = []
        pos = 0
        while pos < A:
            first = idx_sorted[pos]
            # furthest element still within [first, first+128)
            hi = int(
                np.searchsorted(idx_sorted, first + LANES, side="left")
            )
            end = min(pos + LANES, hi, A)
            starts.append((pos, end))
            pos = end

        n_real = len(starts)
        n_rows = ((n_real + CHUNK_ROWS - 1) // CHUNK_ROWS) * CHUNK_ROWS
        ridx = np.zeros((n_rows, LANES), dtype=np.int64)
        rpos = np.full((n_rows, LANES), -1, dtype=np.int64)
        for i, (s, e) in enumerate(starts):
            k = e - s
            ridx[i, :k] = idx_sorted[s:e]
            ridx[i, k:] = idx_sorted[s]  # pad with the row's base index
            rpos[i, :k] = np.arange(s, e)
        rows_pos = rpos
        r = ridx // LANES
        c = (ridx % LANES).astype(np.int32)
        base = r.min(axis=1)
        hi = r - base[:, None]
        assert hi.max() <= 1, "row splitting violated the 2-row invariant"

        p0 = np.zeros((n_rows, S), dtype=np.float32)
        p1 = np.zeros((n_rows, S), dtype=np.float32)
        rows_arange = np.arange(n_rows)
        p0[rows_arange, np.minimum(base, S - 1)] = 1.0
        p1[rows_arange, np.minimum(base + 1, S - 1)] = 1.0

        return SortedGatherPlan(
            p0=jnp.asarray(p0),
            p1=jnp.asarray(p1),
            lane=jnp.asarray(c),
            use_hi=jnp.asarray(hi.astype(bool)),
            src_pos=np.asarray(rows_pos, dtype=np.int64).reshape(-1),
            n_rows=n_rows,
            table_rows=S,
            out_len=n_rows * LANES,
        )


def _kernel(tab_ref, p0_ref, p1_ref, lane_ref, hi_ref, out_ref):
    # the one-hot rows must pass table values through EXACTLY: on the MXU
    # a default-precision f32 dot runs as one bf16 pass (observed ~0.4%
    # rounding); HIGHEST decomposes each f32 into bf16 chunks whose
    # one-hot products reconstruct the value bit-exactly
    rows_a = jnp.dot(
        p0_ref[:, :],
        tab_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rows_b = jnp.dot(
        p1_ref[:, :],
        tab_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    va = jnp.take_along_axis(rows_a, lane_ref[:, :], axis=1)
    vb = jnp.take_along_axis(rows_b, lane_ref[:, :], axis=1)
    out_ref[:, :] = jnp.where(hi_ref[:, :], vb, va)


@functools.partial(jax.jit, static_argnames=("n_rows", "table_rows"))
def _run(table2d, p0, p1, lane, use_hi, n_rows, table_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // CHUNK_ROWS,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table resident
            pl.BlockSpec((CHUNK_ROWS, table_rows), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, table_rows), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, p0, p1, lane, use_hi)


def sorted_gather(table: jax.Array, plan: SortedGatherPlan) -> jax.Array:
    """Gather `table[idx]` for the plan's (sorted, static) indices.
    Returns the [n_rows*128] padded result; `plan.src_pos` maps positions
    back (-1 = padding)."""
    S = plan.table_rows
    pad = S * LANES - table.shape[0]
    table2d = jnp.concatenate(
        [table, jnp.zeros(pad, table.dtype)]
    ).reshape(S, LANES)
    out = _run(
        table2d, plan.p0, plan.p1, plan.lane, plan.use_hi,
        plan.n_rows, plan.table_rows,
    )
    return out.reshape(-1)
