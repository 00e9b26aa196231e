"""EM v3: the fully-static-routed iteration — no XLA gathers or scatters
anywhere on the hot path.

Data flow per iteration (all routing fixed at pack time):

  prev[T]  --sorted MXU gather-->  contrib_csc            (gather_pallas)
  contrib_csc  --GlobalPermute P1-->  contrib in the read-bucket layout
  row reductions  -->  denom / scale per read  -->  broadcast over slots
  scale slots  --GlobalPermute P2-->  scale at CSC positions
  inc = contrib_csc * scale_csc  --tile cumsum + dd prefix-->  curr[T]

Correctness hinges on two invariants: CSC pad slots carry w = 0 (so any
garbage routed into them multiplies to zero), and bucket pad slots
receive zeros through P1 (they route to zero-valued unused source slots),
so row sums see exact denominators. Semantics match `run_em_fast` /
the reference serial EM; parity is tested against the NumPy oracle.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EM_DENOM_THRESH, MIN_READ_THRESH
from .em_fast import TILE, _rel_diff, exclusive_tile_prefix
from .gather_pallas import LANES, SortedGatherPlan, _run as _gather_run
from .static_permute import GlobalPermute


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["g_base", "g_lane", "g_hi", "w_csc", "txp_offsets",
                 "p1", "p2"],
    meta_fields=["g_rows", "g_table_rows", "num_tiles", "bucket_shapes",
                 "bucket_starts", "n_slots", "num_reads", "num_txps"],
)
@dataclass(frozen=True)
class EmV3Data:
    """Static device state for the fully-routed EM (a pytree: all large
    routing arrays travel as jit arguments, never as inlined HLO
    constants — the remote compiler rejects oversized modules)."""

    # sorted prev-gather
    g_base: jax.Array
    g_lane: jax.Array
    g_hi: jax.Array
    g_rows: int
    g_table_rows: int
    w_csc: jax.Array  # [L] weights in plan layout (pads 0)
    txp_offsets: jax.Array  # [T+1] offsets in plan coords
    num_tiles: int
    # permutes (pytree plans)
    p1: object  # GlobalPermutePlan: csc -> bucket slots
    p2: object  # GlobalPermutePlan: bucket slots -> csc
    # bucket layout
    bucket_shapes: Tuple[Tuple[int, int], ...]  # (rows, K) per bucket
    bucket_starts: Tuple[int, ...]  # flat start per bucket
    n_slots: int
    num_reads: int
    num_txps: int

    @staticmethod
    def build(
        txp_id: np.ndarray,
        weights: np.ndarray,
        boundaries: np.ndarray,
        num_txps: int,
        debug: bool = False,
    ) -> Tuple["EmV3Data", np.ndarray]:
        txp_id = np.asarray(txp_id, dtype=np.int64)
        weights = np.asarray(weights, dtype=np.float64)
        boundaries = np.asarray(boundaries, dtype=np.int64)
        R = len(boundaries) - 1
        A = len(txp_id)
        T = int(num_txps)
        sizes = np.diff(boundaries)

        # ---- CSC + sorted-gather plan
        order = np.argsort(txp_id, kind="stable")
        txp_sorted = txp_id[order]
        plan = SortedGatherPlan.build(txp_sorted, T + 1)
        L = plan.out_len

        # ---- read buckets (as em_fast): rows relabeled contiguous
        maxk = int(sizes.max()) if R else 1
        ks: List[int] = []
        K = 1
        while K < maxk:
            ks.append(K)
            K *= 2
        ks.append(max(K, 1))
        bucket_shapes = []
        bucket_starts = []
        order_parts = []
        slot_of_aln = np.zeros(A, dtype=np.int64)
        n_slots = 0
        lo = 0
        rng_rows = np.random.default_rng(3)
        for K in ks:
            rows = np.nonzero((sizes > lo) & (sizes <= K))[0]
            lo = K
            if len(rows) == 0:
                continue
            # shuffle row order within the bucket: the CSC order is
            # read-ordered within each transcript, so hot-transcript
            # single-alignment reads would otherwise map consecutive CSC
            # positions to consecutive bucket slots and concentrate the
            # permute quota into single (src,dst) chunk pairs
            rows = rng_rows.permutation(rows)
            bucket_starts.append(n_slots)
            bucket_shapes.append((len(rows), K))
            row_sizes = sizes[rows]
            rep = np.repeat(np.arange(len(rows)), row_sizes)
            col = (
                np.arange(int(row_sizes.sum()))
                - np.repeat(
                    np.concatenate([[0], np.cumsum(row_sizes)[:-1]]),
                    row_sizes,
                )
            )
            src = np.repeat(boundaries[rows], row_sizes) + col
            slot_of_aln[src] = n_slots + rep * K + col
            order_parts.append(rows)
            n_slots += len(rows) * K
        read_order = (
            np.concatenate(order_parts) if order_parts else np.empty(0, np.int64)
        )

        # ---- rounded layout: interleave the csc padding
        # Both permutes span the full rounded slot space [0, NPAD). A
        # contiguous zero tail on the csc side concentrated whole pad
        # chunks into single (src,dst) quota pairs and doubled
        # GlobalPermute's Q; instead the sorted-gather plan's rows are
        # SPREAD evenly over the rounded row count, with all-zero one-hot
        # pad rows interleaved (they emit zeros; their w_csc is 0). This
        # also dilutes the per-chunk data-flow density on the csc side.
        from .static_permute import CH as _CH, balanced_pad_routing

        NPAD = ((max(L, n_slots) + 2 * _CH - 1) // (2 * _CH)) * (2 * _CH)
        S = plan.table_rows
        NR = NPAD // LANES
        n_old = plan.n_rows
        new_of_old = (np.arange(n_old, dtype=np.int64) * NR) // n_old
        g_base = np.full((NR, LANES), -2, dtype=np.int32)
        g_base[new_of_old] = plan.base[:, None]
        g_lane = np.zeros((NR, LANES), dtype=np.int32)
        g_lane[new_of_old] = np.asarray(plan.lane)
        g_hi = np.zeros((NR, LANES), dtype=bool)
        g_hi[new_of_old] = np.asarray(plan.use_hi)
        src_pos = np.full((NR, LANES), -1, dtype=np.int64)
        src_pos[new_of_old] = plan.src_pos.reshape(n_old, LANES)
        src_pos = src_pos.reshape(-1)

        mask = src_pos >= 0
        w_csc = np.zeros(NPAD, dtype=np.float64)
        w_csc[mask] = weights[order][src_pos[mask]]
        # csc position of each sorted element / of alignment a
        pos_of_sorted = np.zeros(A, dtype=np.int64)
        pos_of_sorted[src_pos[mask]] = np.nonzero(mask)[0]
        csc_pos = np.zeros(A, dtype=np.int64)
        csc_pos[order] = pos_of_sorted

        counts = np.bincount(txp_id, minlength=T)
        offsets = np.zeros(T + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        inv = np.zeros(A + 1, dtype=np.int64)
        inv[src_pos[mask]] = np.nonzero(mask)[0]
        inv[A] = NPAD
        offsets = inv[offsets]

        # ---- permutes (full-length bijections, flow-balanced pads)
        # P1: out[bucket_slot] = contrib_csc[csc_pos]; all other slots
        # route zero-valued sources (csc pads have w=0)
        perm1 = balanced_pad_routing(slot_of_aln, csc_pos, NPAD)
        p1 = GlobalPermute(perm1, NPAD).plan
        # P2: out[csc_pos] = scale_slots[bucket_slot]; csc pads receive
        # arbitrary unused bucket slots (multiplied by w=0 downstream)
        perm2 = balanced_pad_routing(csc_pos, slot_of_aln, NPAD)
        p2 = GlobalPermute(perm2, NPAD).plan

        data = EmV3Data(
            g_base=jnp.asarray(g_base),
            g_lane=jnp.asarray(g_lane),
            g_hi=jnp.asarray(g_hi),
            g_rows=NR,
            g_table_rows=S,
            w_csc=jnp.asarray(w_csc, dtype=jnp.float32),
            txp_offsets=jnp.asarray(offsets),
            num_tiles=NPAD // TILE,
            p1=p1,
            p2=p2,
            bucket_shapes=tuple(bucket_shapes),
            bucket_starts=tuple(bucket_starts),
            n_slots=n_slots,
            num_reads=R,
            num_txps=T,
        )
        if debug:
            dbg = {
                "perm1": perm1,
                "perm2": perm2,
                "src_pos": src_pos,
                "txp_sorted": txp_sorted,
                "w_csc": w_csc,
                "offsets": np.asarray(offsets),
                "slot_of_aln": slot_of_aln,
                "NPAD": NPAD,
            }
            return data, read_order, dbg
        return data, read_order


def _m_step_v3(data: EmV3Data, prev, multiplicity):
    T = data.num_txps
    prev_ext = jnp.concatenate([prev, jnp.zeros(1, prev.dtype)])
    S = data.g_table_rows
    pad = S * LANES - prev_ext.shape[0]
    table2d = jnp.concatenate(
        [prev_ext, jnp.zeros(pad, prev_ext.dtype)]
    ).reshape(S, LANES)
    gathered = _gather_run(
        table2d, data.g_base, data.g_lane, data.g_hi,
        data.g_rows, S,
    ).reshape(-1)
    contrib_csc = gathered * data.w_csc

    # denominators in the bucket layout
    contrib_slots = data.p1(contrib_csc)[: data.n_slots]
    scales = []
    off = 0
    for (rows, K), start in zip(data.bucket_shapes, data.bucket_starts):
        blk = contrib_slots[start : start + rows * K].reshape(rows, K)
        denom = blk.sum(axis=1)
        scales.append(
            jnp.where(denom > EM_DENOM_THRESH, 1.0 / denom, 0.0)
        )
        off += rows * K
    scale = jnp.concatenate(scales) if scales else jnp.zeros(0, prev.dtype)
    if multiplicity is not None:
        scale = scale * multiplicity.astype(prev.dtype)
    # broadcast each read's scale across its K slots
    parts = []
    roff = 0
    for (rows, K), start in zip(data.bucket_shapes, data.bucket_starts):
        parts.append(
            jnp.broadcast_to(
                scale[roff : roff + rows, None], (rows, K)
            ).reshape(-1)
        )
        roff += rows
    scale_slots = jnp.concatenate(parts)
    scale_csc = data.p2(scale_slots)[: contrib_csc.shape[0]]

    inc = contrib_csc * scale_csc
    x2 = inc.reshape(data.num_tiles, TILE)
    local = jnp.cumsum(x2, axis=1)
    g_hi, g_lo = exclusive_tile_prefix(local[:, -1])
    local_flat = jnp.concatenate([jnp.zeros(1, inc.dtype), local.reshape(-1)])

    def prefix_at(pos):
        tile = pos // TILE
        hi = jnp.take(g_hi, tile)
        lo = jnp.take(g_lo, tile)
        within = jnp.where(pos % TILE == 0, 0.0, jnp.take(local_flat, pos))
        return hi, lo + within

    o = data.txp_offsets
    hi2, lo2 = prefix_at(o[1:])
    hi1, lo1 = prefix_at(o[:-1])
    return ((hi2 - hi1) + (lo2 - lo1)).astype(prev.dtype)


def make_runner(data: EmV3Data, accel: str = "none"):
    """Jitted EM runner; `data` is a pytree argument. `accel="squarem"`
    runs the squared-extrapolation loop (`em.squarem_loop`)."""

    if accel == "squarem":
        def run_em_v3(init, max_iter, convergence_thresh,
                      multiplicity=None, min_iters=50):
            return _run_em_v3_squarem_jit(
                data, init, max_iter, convergence_thresh,
                multiplicity, min_iters,
            )
    else:
        def run_em_v3(init, max_iter, convergence_thresh,
                      multiplicity=None, min_iters=50):
            return _run_em_v3_jit(
                data, init, max_iter, convergence_thresh,
                multiplicity, min_iters,
            )

    return run_em_v3


@functools.partial(jax.jit, static_argnames=("max_iter", "min_iters"))
def _run_em_v3_squarem_jit(data, init, max_iter, convergence_thresh,
                           multiplicity=None, min_iters=50):
    from .em import squarem_em

    return squarem_em(
        lambda p: _m_step_v3(data, p, multiplicity),
        init, max_iter, convergence_thresh, min_iters,
    )


@functools.partial(jax.jit, static_argnames=("max_iter", "min_iters"))
def _run_em_v3_jit(data, init, max_iter, convergence_thresh,
                   multiplicity=None, min_iters=50):
    return _run_em_v3(data, init, max_iter, convergence_thresh,
                      multiplicity, min_iters)


def _run_em_v3(
    data: EmV3Data,
    init: jax.Array,
    max_iter: int,
    convergence_thresh,
    multiplicity: Optional[jax.Array] = None,
    min_iters: int = 50,
):
    """Same loop semantics as `run_em` (`em.rs:144-255`)."""
    convergence_thresh = jnp.asarray(convergence_thresh, dtype=init.dtype)

    def cond(state):
        niter, _prev, converged = state
        return jnp.any((niter < max_iter) & (~converged))

    def body(state):
        niter, prev, converged = state
        curr = _m_step_v3(data, prev, multiplicity)
        rd = _rel_diff(prev, curr)
        newly = (rd < convergence_thresh) & (niter > min_iters)
        curr = jnp.where(converged, prev, curr)
        niter = jnp.where(converged, niter, niter + 1)
        return (niter, curr, converged | newly)

    niter, prev, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), init, jnp.asarray(False))
    )
    prev = jnp.where(prev < MIN_READ_THRESH, 0.0, prev)
    counts = _m_step_v3(data, prev, multiplicity)
    return counts, niter
