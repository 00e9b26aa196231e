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
    """Static routing for gathering `table[idx]` (idx sorted).

    The per-row one-hot delivery matrices are NOT materialized: each
    output row stores only its base table-row index, and the kernel
    reconstructs the [rows, S] one-hots with an iota compare (streaming
    materialized one-hots cost S/1 x the HBM traffic — 722 MB/iteration
    at transcriptome scale)."""

    base: np.ndarray  # [n_rows] i32: each row's base table-row (<0 = pad)
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

        # rows beyond n_real are pure padding: base -2 matches neither
        # iota compare, so they emit zeros (base+1 == S for a real last
        # row is likewise a harmless no-match: use_hi is never set there)
        base_i32 = np.full(n_rows, -2, dtype=np.int32)
        base_i32[:n_real] = base[:n_real]

        return SortedGatherPlan(
            base=base_i32,
            lane=jnp.asarray(c),
            use_hi=jnp.asarray(hi.astype(bool)),
            src_pos=np.asarray(rows_pos, dtype=np.int64).reshape(-1),
            n_rows=n_rows,
            table_rows=S,
            out_len=n_rows * LANES,
        )


def _make_kernel(S: int):
    def _kernel(tab_ref, base_ref, lane_ref, hi_ref, out_ref):
        # one-hot delivery matrices built in-register from the base row
        # index (iota compare) -- never streamed from HBM (materialized
        # [rows, S] one-hots cost 722 MB/iteration at transcriptome
        # scale). They must pass table values through EXACTLY: on the
        # MXU a default-precision f32 dot runs as one bf16 pass
        # (observed ~0.4% rounding); HIGHEST decomposes each f32 into
        # bf16 chunks whose one-hot products reconstruct the value
        # bit-exactly.
        base = base_ref[:, 0:1]  # [rows, 1] i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, S), 1)
        oh0 = jnp.where(iota == base, 1.0, 0.0).astype(jnp.float32)
        oh1 = jnp.where(iota == base + 1, 1.0, 0.0).astype(jnp.float32)
        rows_a = jnp.dot(
            oh0,
            tab_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rows_b = jnp.dot(
            oh1,
            tab_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        va = jnp.take_along_axis(rows_a, lane_ref[:, :], axis=1)
        vb = jnp.take_along_axis(rows_b, lane_ref[:, :], axis=1)
        out_ref[:, :] = jnp.where(hi_ref[:, :], vb, va)

    return _kernel


def _interpret() -> bool:
    """Pallas interpret mode off-TPU: the kernels then lower to plain jax
    ops, so the full v3 path is exercisable (and testable) on CPU."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("n_rows", "table_rows"))
def _run(table2d, base2d, lane, use_hi, n_rows, table_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows // CHUNK_ROWS,)
    return pl.pallas_call(
        _make_kernel(table_rows),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table resident
            pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table2d, base2d, lane, use_hi)


def base_lanes(base: np.ndarray) -> jax.Array:
    """Broadcast the per-row base index across 128 lanes (the kernel
    reads lane 0; a full-lane tile keeps the layout trivial)."""
    return jnp.asarray(np.broadcast_to(np.asarray(base)[:, None],
                                       (len(base), LANES)).copy())


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
        table2d, base_lanes(plan.base), plan.lane, plan.use_hi,
        plan.n_rows, plan.table_rows,
    )
    return out.reshape(-1)
