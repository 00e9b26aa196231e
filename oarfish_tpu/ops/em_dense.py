"""Dense one-hot MXU EM for batched tiny problems (single-cell buckets).

The per-cell EM (`single_cell.rs:141-150` runs one serial scalar EM per
barcode) has per-cell spaces so small (t_pad <= 512 local transcripts,
a_pad <= 4096 alignments after pow2 bucketing) that sparse gather/
scatter formulations are pinned to XLA's ~7 ns/element dynamic-index
floor (~24 us/cell/iter measured at a_pad=512 — PERF_NOTES.md). On a
dense machine the right formulation is dense: materialize the two
static 0/1 incidence matrices per cell once at pack time —

    S [a_pad, t_pad]  alignment -> local transcript (one-hot rows)
    R [r_pad, a_pad]  read -> alignment (contiguous-segment rows)

— and run the fused E/M step (`em.rs:87-133` semantics) as four batched
matmuls on the MXU:

    contrib = (S @ prev) * w          denom = R @ contrib
    inc     = contrib * (R^T @ scale) curr  = S^T @ inc

Pad rows are all-zero, so padding needs no sentinel slots: pad
alignments contribute nothing, pad reads get denom 0 -> scale 0, and
pad transcripts stay 0. The matrices are stored bf16 (0/1 is exact) and
widened to the compute dtype in the step; matmuls run at
Precision.HIGHEST so f32 `prev`/`contrib` enter the MXU unrounded (a
DEFAULT f32 dot is a single bf16 pass — 4e-3 relative error, outside
the ~1e-4 parity envelope).

Loop semantics mirror `run_em` exactly (min 50 iters, per-cell
convergence freezing, zero-below-1e-5 + one final step).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EM_DENOM_THRESH, MIN_READ_THRESH
from .em import _rel_diff, squarem_em


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["S", "R", "weights"],
    meta_fields=[],
)
@dataclass(frozen=True)
class DenseCellEm:
    """One bucket of cells as dense one-hot incidence matrices."""

    S: jax.Array  # [B, a_pad, t_pad] bf16 0/1: alignment -> transcript
    R: jax.Array  # [B, r_pad, a_pad] bf16 0/1: read -> alignment
    weights: jax.Array  # [B, a_pad] f32 (0 on pad slots)

    @staticmethod
    def build(
        txp_local: List[np.ndarray],
        weights: List[np.ndarray],
        read_id: List[np.ndarray],
        a_pad: int,
        r_pad: int,
        t_pad: int,
        dtype=jnp.float32,
        put=jnp.asarray,
    ) -> "DenseCellEm":
        B = len(txp_local)
        S = np.zeros((B, a_pad, t_pad), dtype=np.int8)
        R = np.zeros((B, r_pad, a_pad), dtype=np.int8)
        W = np.zeros((B, a_pad), dtype=np.float64)
        ar = np.arange(a_pad)
        for i in range(B):
            a = len(txp_local[i])
            S[i, ar[:a], txp_local[i]] = 1
            R[i, read_id[i], ar[:a]] = 1
            W[i, :a] = weights[i]
        import ml_dtypes

        return DenseCellEm(
            S=put(S.astype(ml_dtypes.bfloat16)),
            R=put(R.astype(ml_dtypes.bfloat16)),
            weights=put(W.astype(dtype)),
        )


def _m_step_dense(data: DenseCellEm, prev_b: jax.Array) -> jax.Array:
    """One fused E/M step over the bucket batch: four MXU matmuls."""
    dt = prev_b.dtype
    hi = jax.lax.Precision.HIGHEST
    S = data.S.astype(dt)
    R = data.R.astype(dt)
    contrib = (
        jnp.einsum("bat,bt->ba", S, prev_b, precision=hi)
        * data.weights.astype(dt)
    )
    denom = jnp.einsum("bra,ba->br", R, contrib, precision=hi)
    scale = jnp.where(denom > EM_DENOM_THRESH, 1.0 / denom, 0.0)
    inc = contrib * jnp.einsum("bra,br->ba", R, scale, precision=hi)
    return jnp.einsum("bat,ba->bt", S, inc, precision=hi)


@functools.partial(jax.jit, static_argnames=("max_iter", "min_iters"))
def run_em_dense(
    data: DenseCellEm,
    init_b: jax.Array,
    max_iter: int,
    convergence_thresh,
    min_iters: int = 50,
):
    """Batched EM loop with per-cell convergence freezing — the exact
    `run_em` protocol (`em.rs:144-255`) over the bucket's leading axis.
    Returns ([B, t_pad] counts, [B] iteration counts)."""
    convergence_thresh = jnp.asarray(convergence_thresh, dtype=init_b.dtype)
    B = init_b.shape[0]

    def cond(state):
        niter, _prev, conv = state
        return jnp.any((niter < max_iter) & (~conv))

    def body(state):
        niter, prev, conv = state
        curr = _m_step_dense(data, prev)
        rd = jax.vmap(_rel_diff)(prev, curr)
        newly = (rd < convergence_thresh) & (niter > min_iters)
        curr = jnp.where(conv[:, None], prev, curr)
        niter = jnp.where(conv, niter, niter + 1)
        return (niter, curr, conv | newly)

    state0 = (jnp.zeros(B, jnp.int32), init_b, jnp.zeros(B, bool))
    niter, prev, _ = jax.lax.while_loop(cond, body, state0)
    prev = jnp.where(prev < MIN_READ_THRESH, 0.0, prev)
    return _m_step_dense(data, prev), niter


@functools.partial(jax.jit, static_argnames=("max_iter", "min_iters"))
def run_em_dense_squarem(
    data: DenseCellEm,
    init_b: jax.Array,
    max_iter: int,
    convergence_thresh,
    min_iters: int = 50,
):
    """SQUAREM-accelerated variant (same protocol as `run_em_squarem`)."""
    return squarem_em(
        lambda p: _m_step_dense(data, p),
        init_b, max_iter, convergence_thresh, min_iters,
        batched=True,
    )
