"""Device kernels applying STATIC permutations at hardware speed.

`DeviceTilePlan` routes any fixed permutation of a `[R,128]` tile through
the three-stage decomposition of `permute_plan.py`, built only from ops
Mosaic supports (PERF_NOTES.md): 128-lane row shuffles
(`take_along_axis` axis 1), 128x128 transposes, and masked merges. The
column stage (independent row-permutation per column) runs in transposed
space blockwise: each destination 128-row block stores, per element, the
source block id and source lane (int8 — 2 bytes of routing per element).

`GlobalPermute` lifts this to arbitrary-length arrays: chunk the input,
permute each chunk into a destination-bucket/quota layout (batched tile
permute), move buckets between chunks with one dense XLA 3D transpose,
and run a second batched tile permute into final order. ~6 VPU passes +
2 HBM passes regardless of the permutation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .permute_plan import (
    LANES,
    TilePermutePlan,
    edge_color_batch,
    edge_color_bipartite,
    route_tables_native,
)


@dataclass(frozen=True)
class DeviceTilePlan:
    """Compact static routing for one [R,128] tile (2-3 B/element)."""

    r1: np.ndarray  # [R,128] i8: stage-1 lane gather
    r2: np.ndarray  # [R,128] i8: stage-3 lane gather
    col_src: np.ndarray  # [H,128,128] i8: source block per (dst blk, c, r')
    col_lane: np.ndarray  # [H,128,128] i8: source lane within block
    rows: int

    @staticmethod
    def build(perm: np.ndarray, rows: int) -> "DeviceTilePlan":
        base = TilePermutePlan.build(perm, rows)
        R = rows
        H = R // LANES
        assert R % LANES == 0 and H <= 127
        src_row = base.col_perm  # [R,128]: source row feeding (r, c)
        col_src = np.zeros((H, LANES, LANES), dtype=np.int8)
        col_lane = np.zeros((H, LANES, LANES), dtype=np.int8)
        for hd in range(H):
            rs = src_row[hd * LANES : (hd + 1) * LANES, :]  # [r'_d, c]
            col_src[hd] = (rs // LANES).astype(np.int8).T  # [c, r'_d]
            col_lane[hd] = (rs % LANES).astype(np.int8).T
        return DeviceTilePlan(
            r1=base.r1.astype(np.int8),
            r2=base.r2.astype(np.int8),
            col_src=col_src,
            col_lane=col_lane,
            rows=R,
        )

    def apply_numpy(self, x: np.ndarray) -> np.ndarray:
        R, H = self.rows, self.rows // LANES
        t = x.reshape(R, LANES)
        s1 = np.take_along_axis(t, self.r1.astype(np.int64), axis=1)
        blocks = [s1[h * LANES : (h + 1) * LANES].T for h in range(H)]
        out_blocks = []
        for hd in range(H):
            acc = np.zeros((LANES, LANES), dtype=t.dtype)
            lane = self.col_lane[hd].astype(np.int64)
            for hs in range(H):
                g = np.take_along_axis(blocks[hs], lane, 1)
                acc = np.where(self.col_src[hd] == hs, g, acc)
            out_blocks.append(acc.T)
        s2 = np.concatenate(out_blocks, axis=0)
        s3 = np.take_along_axis(s2, self.r2.astype(np.int64), axis=1)
        return s3.reshape(-1)


def _make_kernel(H: int):
    def kernel(x_ref, r1_ref, r2_ref, src_ref, lane_ref, out_ref):
        s1 = jnp.take_along_axis(
            x_ref[:, :], r1_ref[0].astype(jnp.int32), axis=1
        )
        blocks = [s1[h * LANES : (h + 1) * LANES, :].T for h in range(H)]
        outs = []
        for hd in range(H):
            lane = lane_ref[0, hd].astype(jnp.int32)
            # int8 vector compares are unsupported on this target
            src = src_ref[0, hd].astype(jnp.int32)
            acc = jnp.zeros((LANES, LANES), s1.dtype)
            for hs in range(H):
                g = jnp.take_along_axis(blocks[hs], lane, axis=1)
                acc = jnp.where(src == hs, g, acc)
            outs.append(acc.T)
        s2 = jnp.concatenate(outs, axis=0)
        out_ref[:, :] = jnp.take_along_axis(
            s2, r2_ref[0].astype(jnp.int32), axis=1
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "n_tiles"))
def _run_batch(x, r1, r2, src, lane, rows, n_tiles):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .gather_pallas import _interpret

    H = rows // LANES
    kernel = _make_kernel(H)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, LANES), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, LANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, LANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, r1, r2, src, lane)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["r1", "r2", "src", "lane"],
    meta_fields=["rows", "n_tiles"],
)
@dataclass(frozen=True)
class BatchTilePermute:
    """A batch of per-tile static permutations in one pallas call.
    A pytree: the routing arrays travel as jit ARGUMENTS (closure capture
    would inline hundreds of MB of metadata into the HLO)."""

    r1: jax.Array
    r2: jax.Array
    src: jax.Array
    lane: jax.Array
    rows: int
    n_tiles: int

    @staticmethod
    def build(plans: List[DeviceTilePlan]) -> "BatchTilePermute":
        return BatchTilePermute(
            r1=jnp.asarray(np.stack([p.r1 for p in plans])),
            r2=jnp.asarray(np.stack([p.r2 for p in plans])),
            src=jnp.asarray(np.stack([p.col_src for p in plans])),
            lane=jnp.asarray(np.stack([p.col_lane for p in plans])),
            rows=plans[0].rows,
            n_tiles=len(plans),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x2 = x.reshape(self.n_tiles * self.rows, LANES)
        out = _run_batch(
            x2, self.r1, self.r2, self.src, self.lane,
            self.rows, self.n_tiles,
        )
        return out.reshape(-1)


# ---------------------------------------------------------------------------
# Global (arbitrary length) static permutation
# ---------------------------------------------------------------------------

CH = 128 * LANES  # elements per chunk (16384)


def _roundup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def spread_roundrobin(vals: np.ndarray, chunk: int = CH) -> np.ndarray:
    """Reorder slot ids so consecutive picks rotate across chunks: pairing
    concentrated destinations with this order keeps per-(src,dst)-chunk
    flows near uniform instead of an outer product of concentrations."""
    vals = np.asarray(vals)
    if len(vals) == 0:
        return vals
    ch = vals // chunk
    order = np.argsort(ch, kind="stable")
    sorted_vals = vals[order]
    ch_sorted = ch[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(ch_sorted))[0] + 1])
    gid = np.zeros(len(vals), dtype=np.int64)
    gid[starts] = 1
    gid = np.cumsum(gid) - 1
    rank = np.arange(len(vals)) - starts[gid]
    rr = np.argsort(rank * (ch_sorted.max() + 1) + ch_sorted, kind="stable")
    return sorted_vals[rr]


def balanced_pad_routing(
    out_idx: np.ndarray,
    in_idx: np.ndarray,
    n_pad: int,
    chunk: int = CH,
) -> np.ndarray:
    """Complete `out[out_idx] = in_idx` to a bijection over [0, n_pad),
    assigning the pad (out, in) pairs by a capacitated transportation
    waterfill so the per-(src,dst)-chunk flow maximum stays as close to
    the data flows' own maximum as supply/demand allow. (Naive pairings
    of the free slots were observed to double the max flow, which
    directly inflates GlobalPermute's quota Q.)"""
    perm = np.full(n_pad, -1, dtype=np.int64)
    perm[out_idx] = in_idx
    free_out = np.nonzero(perm < 0)[0]
    used = np.zeros(n_pad, dtype=bool)
    used[in_idx] = True
    free_in = np.nonzero(~used)[0]
    if len(free_out) == 0:
        return perm
    n_ch = n_pad // chunk
    F = np.zeros((n_ch, n_ch), dtype=np.int64)
    np.add.at(F, (np.asarray(in_idx) // chunk, np.asarray(out_idx) // chunk), 1)
    P = np.bincount(free_out // chunk, minlength=n_ch)
    supply0 = np.bincount(free_in // chunk, minlength=n_ch)

    total = int(P.sum())

    def try_fill(C):
        """Exact feasibility of per-pair cap C as a max-flow instance:
        source -> src chunks (cap = free inputs there), src -> dst edges
        (cap = C - data flow), dst chunks -> sink (cap = pads needed).
        Returns the pad-assignment matrix, or None if infeasible."""
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import maximum_flow

        cap = np.maximum(C - F, 0)
        n = 2 * n_ch + 2
        src_nodes = 1 + np.arange(n_ch)
        dst_nodes = 1 + n_ch + np.arange(n_ch)
        rows = np.concatenate([
            np.zeros(n_ch, np.int64),
            np.repeat(src_nodes, n_ch),
            dst_nodes,
        ])
        cols = np.concatenate([
            src_nodes,
            np.tile(dst_nodes, n_ch),
            np.full(n_ch, n - 1, np.int64),
        ])
        caps = np.concatenate([supply0, cap.reshape(-1), P])
        keep = caps > 0
        g = csr_matrix(
            (caps[keep].astype(np.int32), (rows[keep], cols[keep])), (n, n)
        )
        res = maximum_flow(g, 0, n - 1)
        if res.flow_value < total:
            return None
        fl = res.flow.tocsr()[src_nodes][:, dst_nodes].toarray()
        return np.maximum(fl, 0).astype(np.int64)

    lo_c, hi_c = int(F.max()), int(F.max() + P.max() + 1)
    best = None
    while lo_c < hi_c:
        C = (lo_c + hi_c) // 2
        x = try_fill(C)
        if x is not None:
            best = x
            hi_c = C
        else:
            lo_c = C + 1
    if best is None:
        best = try_fill(hi_c)
    x = best

    # materialize the pairing: per dst chunk, pull the assigned counts
    # from each src chunk's queue of free inputs
    o_in = np.argsort(free_in // chunk, kind="stable")
    fi_sorted = free_in[o_in]
    ptr = np.searchsorted(fi_sorted // chunk, np.arange(n_ch)).astype(np.int64)
    o_out = np.argsort(free_out // chunk, kind="stable")
    fo_sorted = free_out[o_out]
    db = np.searchsorted(fo_sorted // chunk, np.arange(n_ch + 1))
    for d in range(n_ch):
        outs = fo_sorted[db[d] : db[d + 1]]
        if len(outs) == 0:
            continue
        ins = np.empty(len(outs), dtype=np.int64)
        pos = 0
        for s in np.nonzero(x[:, d])[0]:
            cnt = int(x[s, d])
            ins[pos : pos + cnt] = fi_sorted[ptr[s] : ptr[s] + cnt]
            ptr[s] += cnt
            pos += cnt
        perm[outs] = ins
    return perm


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["stage1", "stage3"],
    meta_fields=["n_in", "n_out", "n_src", "n_dst", "n_dst_pad", "Q",
                 "R1", "R3"],
)
@dataclass(frozen=True)
class GlobalPermutePlan:
    stage1: BatchTilePermute
    stage3: BatchTilePermute
    n_in: int
    n_out: int
    n_src: int
    n_dst: int
    n_dst_pad: int
    Q: int
    R1: int
    R3: int

    def __call__(self, x: jax.Array) -> jax.Array:
        n_src, n_dst = self.n_src, self.n_dst
        Q = self.Q
        x_pad = jnp.zeros(n_src * CH, x.dtype).at[: x.shape[0]].set(x)
        xg = jnp.zeros((n_src, self.R1 * LANES), x.dtype)
        xg = xg.at[:, :CH].set(x_pad.reshape(n_src, CH))
        y1 = self.stage1(xg.reshape(-1))
        y1 = y1.reshape(n_src, self.n_dst_pad, Q)[:, :n_dst, :]
        y2 = jnp.transpose(y1, (1, 0, 2))
        zg = jnp.zeros((n_dst, self.R3 * LANES), x.dtype)
        zg = zg.at[:, : n_src * Q].set(y2.reshape(n_dst, n_src * Q))
        y3 = self.stage3(zg.reshape(-1)).reshape(n_dst, self.R3 * LANES)
        return y3[:, :CH].reshape(-1)[: self.n_out]


class GlobalPermute:
    """out[p] = x[perm[p]] for a fixed permutation over large arrays.

    Three stages, all static:
      1. per source chunk, a tile permute groups its elements by
         destination chunk into a [n_dst_pad, Q] quota layout;
      2. one dense XLA transpose moves quota buckets between chunks;
      3. per destination chunk, a tile permute produces final order.

    Use `.plan` (a pytree) inside jitted code.
    """

    def __init__(self, perm: np.ndarray, n_in: int):
        perm = np.asarray(perm, dtype=np.int64)
        N_out = len(perm)
        assert len(np.unique(perm)) == N_out, "perm must be injective"
        self.n_in = n_in
        n_src = _roundup(n_in, CH) // CH
        n_dst = _roundup(N_out, CH) // CH
        # the tile plans need true bijections (the edge coloring requires
        # a regular graph), so pad outputs are routed to the unused input
        # slots; equalize the padded sizes
        n_src = n_dst = max(n_src, n_dst)
        N_out_pad = n_dst * CH
        n_in_pad = n_src * CH
        perm_pad = np.zeros(N_out_pad, dtype=np.int64)
        perm_pad[:N_out] = perm
        unused_in = np.setdiff1d(
            np.arange(n_in_pad), perm, assume_unique=False
        )
        assert len(unused_in) == N_out_pad - N_out
        # spread pad->pad routing across source chunks so it cannot
        # dominate the per-(src,dst) quota
        perm_pad[N_out:] = spread_roundrobin(unused_in)
        self.n_out = N_out

        d_of = np.arange(N_out_pad) // CH
        s_of = perm_pad // CH
        flows = np.zeros((n_src, n_dst), dtype=np.int64)
        np.add.at(flows, (s_of, d_of), 1)
        maxflow = int(flows.max())
        # quota-layout sizing: [n_dst_pad, Q] per chunk must tile into
        # [R1, 128] with R1 % 128 == 0, i.e. n_pad * Q % 16384 == 0.
        # Rounding the chunk-count padding UP can legalize a much finer
        # Q granularity (e.g. n_pad=512 allows Q%32 instead of Q%256),
        # shrinking the inflated grid — pick the (n_pad, Q) minimizing it.
        import math as _math

        best = None
        for gran in (64, 128, 256, 512, 1024):
            npd = _roundup(max(n_src, n_dst), gran)
            q_step = (LANES * LANES) // _math.gcd(LANES * LANES, npd)
            q = _roundup(maxflow, q_step)
            if best is None or npd * q < best[0]:
                best = (npd * q, npd, q)
        _, npd, Q = best
        n_src_pad = n_dst_pad = npd
        self.n_src, self.n_dst = n_src, n_dst
        self.n_src_pad, self.n_dst_pad, self.Q = n_src_pad, n_dst_pad, Q
        R1 = n_dst_pad * Q // LANES  # stage-1 grid rows per chunk
        R3 = n_src_pad * Q // LANES
        assert R1 % LANES == 0 and R3 % LANES == 0
        if max(R1, R3) // LANES > 16:
            # degenerate quota (too few chunks or extreme flow skew): the
            # unrolled column stage would explode; callers should fall
            # back to a jnp gather at such sizes
            raise ValueError(
                f"GlobalPermute degenerate: H={max(R1, R3) // LANES} "
                f"(Q={Q}, n_chunks={n_src}); use a plain gather instead"
            )

        # rank of each output within its (s, d) flow, ordered by p
        order = np.lexsort((np.arange(N_out_pad), d_of, s_of))
        rank = np.zeros(N_out_pad, dtype=np.int64)
        # within sorted order, rank = position within each (s,d) group
        sd = s_of[order] * n_dst + d_of[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(sd))[0] + 1])
        group_id = np.zeros(N_out_pad, dtype=np.int64)
        group_id[starts] = 1
        group_id = np.cumsum(group_id) - 1
        group_start = starts[group_id]
        rank[order] = np.arange(N_out_pad) - group_start

        # stage-1 plans: for src chunk s, grid [R1,128]: slot layout
        # d*Q + rank <- source slot (perm_pad[p] % CH) in rows [0,256)
        def complete_bijection(tgt_slot, src_slot, n_slots):
            """tile_perm[tgt] = src, with dead slots paired bijectively."""
            tile_perm = np.full(n_slots, -1, dtype=np.int64)
            tile_perm[tgt_slot] = src_slot
            free_out = np.nonzero(tile_perm < 0)[0]
            used_in = np.zeros(n_slots, dtype=bool)
            used_in[src_slot] = True
            free_in = np.nonzero(~used_in)[0]
            tile_perm[free_out] = free_in
            return tile_perm

        stage1_plans = []
        for s in range(n_src):
            sel = np.nonzero(s_of == s)[0]  # output positions sourced here
            tgt_slot = d_of[sel] * Q + rank[sel]
            src_slot = perm_pad[sel] % CH
            tile_perm = complete_bijection(tgt_slot, src_slot, R1 * LANES)
            stage1_plans.append(DeviceTilePlan.build(tile_perm, R1))
        self._stage1 = BatchTilePermute.build(stage1_plans)
        self.R1 = R1

        # stage-3 plans: for dst chunk d, input layout [n_src_pad, Q]
        # (after the transpose), output = final order in slots [0, CH)
        stage3_plans = []
        for d in range(n_dst):
            sel = np.nonzero(d_of == d)[0]
            in_slot = s_of[sel] * Q + rank[sel]
            out_slot = sel % CH
            tile_perm = complete_bijection(out_slot, in_slot, R3 * LANES)
            stage3_plans.append(DeviceTilePlan.build(tile_perm, R3))
        self._stage3 = BatchTilePermute.build(stage3_plans)
        self.R3 = R3
        self.plan = GlobalPermutePlan(
            stage1=self._stage1,
            stage3=self._stage3,
            n_in=self.n_in,
            n_out=self.n_out,
            n_src=self.n_src,
            n_dst=self.n_dst,
            n_dst_pad=self.n_dst_pad,
            Q=self.Q,
            R1=self.R1,
            R3=self.R3,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.plan(x)


# ---------------------------------------------------------------------------
# GlobalRoute: rectangular gather networks (v2 of GlobalPermute)
# ---------------------------------------------------------------------------
#
# GlobalPermute works on full bijections: pad outputs must be routed to
# zero-valued inputs (flow-balanced pad routing) and each chunk runs a
# square [R1,128] three-stage permutation even though its real payload is
# one 128-row block. GlobalRoute exploits gather semantics instead: the
# map only covers the REAL elements (a partial injective map), quota-pad
# garbage is never read back, and output pads are zeroed by a static
# mask. Per chunk:
#
#   stage 1 (expand, [128,128] -> [R1,128]): lane shuffle into channel
#     columns, a column-stage gather delivering each channel to its
#     quota row (H_o block gathers from ONE source block), and a lane
#     shuffle to the final quota lane;
#   XLA dense transpose of the [n_src, n_dst, Q] quota tensor;
#   stage 3 (reduce, [R3,128] -> [128,128]): mirrored, with an output
#     zero-mask for the bijection pads that no longer need routing.
#
# Channel assignments are two independent bipartite edge colorings per
# chunk ((input row, quota row) and (quota row, output row)), always
# 128-colorable (Konig); irregular degrees are regularized with dummy
# edges before coloring.


def route_maxflow(out_idx: np.ndarray, in_idx: np.ndarray,
                  n_pad: int, chunk: int = CH,
                  n_pad_out: Optional[int] = None) -> int:
    """Max per-(src,dst)-chunk flow of the partial map — the quota Q a
    GlobalRoute needs. Exposed so shard-uniform plans can take the max
    over shards before forcing a common geometry. `n_pad_out` sizes the
    dst space when it differs from the src space (rectangular routes)."""
    n_src = n_pad // chunk
    n_dst = (n_pad if n_pad_out is None else n_pad_out) // chunk
    from .balance import flows2d

    flows = flows2d(in_idx, out_idx, chunk, n_src, n_dst)
    if flows is None:
        flows = np.zeros((n_src, n_dst), dtype=np.int64)
        np.add.at(
            flows,
            (np.asarray(in_idx) // chunk, np.asarray(out_idx) // chunk),
            1,
        )
    return max(int(flows.max()), 1)


def select_route_geometry(n_ch: int, maxflow: int,
                          q128: bool = False) -> Tuple[int, int]:
    """(chunk-pad, Q) selection: require n_chunks * Q % 16384 == 0 on
    BOTH sides so the quota exchange in __call__ is a pure
    reshape/transpose/reshape (no slice, no zero-pad set — the glue
    otherwise costs ~0.7 ms/route at A=6M). Padding the chunk count up
    legalizes finer Q granularity; minimize grid area n_pad*Q,
    tie-broken toward fewer chunks.

    With `q128` the quota is additionally rounded to a multiple of 128
    (whole lane tiles): the exchange then needs no transpose at all —
    stage 3 (and the fused middle) read their dst-chunk column slab
    straight out of the src-major quota tensor via strided BlockSpecs
    (`reduce_strided`). Costs quota area; `route_config` applies the
    measured break-even rule."""
    import math as _math

    best = None
    for gran in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024):
        npd = _roundup(n_ch, gran)
        q_step = (LANES * LANES) // _math.gcd(LANES * LANES, npd)
        if q128:
            q_step = q_step * LANES // _math.gcd(q_step, LANES)
        q = _roundup(maxflow, q_step)
        if best is None or (npd * q, npd) < (best[0], best[1]):
            best = (npd * q, npd, q)
    _, npd, Q = best
    return npd, Q


def _chunks_per_program(n_chunks: int, bytes_per_chunk: int,
                        budget: int = 4 << 20, cap: int = 8) -> int:
    """Batch several chunks into one grid program to amortize per-program
    and per-DMA overhead (measured ~1 us/program through the route grids:
    at n=512 chunks the overhead dominated the ~100-cycle shuffle work).
    Must divide n_chunks (the exchange reshape needs exact coverage) and
    fit the ~16 MB VMEM with double buffering. OARFISH_ROUTE_CPP_CAP
    overrides the cap (0/1 disables batching) for A/B measurement."""
    import os

    env = os.environ.get("OARFISH_ROUTE_CPP_CAP")
    if env is not None:
        cap = max(1, int(env))
    envb = os.environ.get("OARFISH_ROUTE_VMEM_MB")
    if envb is not None:
        budget = int(float(envb) * (1 << 20))
    cpp = 1
    c = 2
    while c <= cap:
        if n_chunks % c == 0 and c * bytes_per_chunk <= budget:
            cpp = c
        c *= 2
    return cpp


def _stage_apply(x, r1, src, row_t, r2, mask, H_in, H_out):
    """One gather-network stage on VMEM values: [R_in,128] -> [R_out,128].
    Lane shuffle (element -> channel), per-output-block channel delivery
    (gather from the matching input block, selected by a static
    source-block table when H_in > 1), lane shuffle to the final lane
    (+ static zero mask for outputs not covered by data)."""
    s1 = jnp.take_along_axis(x, r1.astype(jnp.int32), axis=1)
    blocks = [
        s1[h * LANES : (h + 1) * LANES, :].T for h in range(H_in)
    ]  # [channel, row-in-block]
    outs = []
    for ho in range(H_out):
        row = row_t[ho].astype(jnp.int32)
        if H_in == 1:
            acc = jnp.take_along_axis(blocks[0], row, axis=1)
        else:
            src_h = src[ho].astype(jnp.int32)
            acc = jnp.zeros((LANES, LANES), s1.dtype)
            for hi in range(H_in):
                g = jnp.take_along_axis(blocks[hi], row, axis=1)
                acc = jnp.where(src_h == hi, g, acc)
        outs.append(acc.T)  # [out-row-in-block, channel]
    q = jnp.concatenate(outs, axis=0)  # [R_out,128] at channel
    out = jnp.take_along_axis(q, r2.astype(jnp.int32), axis=1)
    if mask is not None:
        out = jnp.where(mask != 0, out, 0.0)
    return out


def _make_route_kernel(H_in: int, H_out: int, cpp: int, has_mul: bool,
                       has_mask: bool, strided_qr: int = 0, B: int = 0):
    """Gather-network stage kernel over cpp chunks per grid program.
    With `strided_qr` the value operand arrives as the STRIDED quota
    view [n_other, cpp*Qr, 128] (dst-chunk columns across every source
    chunk, Qr = Q/128) instead of a contiguous [cpp*R_in, 128] block —
    the transpose-free exchange (see GlobalRoutePlan.reduce_strided).
    With `B > 0` the value/output refs carry a leading replicate axis
    and the kernel loops over it — the static routing tables are read
    ONCE per program instead of once per replicate (the vmap lowering
    re-reads them B times; tables are ~40% of m-step HBM traffic at the
    bench shape). `mul` stays UNBATCHED (shared weights)."""
    R_in = H_in * LANES
    R_out = H_out * LANES

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        y_ref = next(it) if has_mul else None
        r1_ref = next(it)
        src_ref = next(it) if H_in > 1 else None
        row_ref = next(it)
        r2_ref = next(it)
        mask_ref = next(it) if has_mask else None
        out_ref = next(it)
        for b in range(max(B, 1)):
            for j in range(cpp):
                if strided_qr:
                    xs = x_ref[b, :, j, :, :] if B else x_ref[:, j, :, :]
                    x = xs.reshape(R_in, LANES)
                elif B:
                    x = x_ref[b, j * R_in : (j + 1) * R_in, :]
                else:
                    x = x_ref[j * R_in : (j + 1) * R_in, :]
                if has_mul:
                    x = x * y_ref[j * R_in : (j + 1) * R_in, :]
                out = _stage_apply(
                    x,
                    r1_ref[j],
                    None if src_ref is None else src_ref[j],
                    row_ref[j],
                    r2_ref[j],
                    mask_ref[j] if has_mask else None,
                    H_in,
                    H_out,
                )
                if B:
                    out_ref[b, j * R_out : (j + 1) * R_out, :] = out
                else:
                    out_ref[j * R_out : (j + 1) * R_out, :] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "R_in", "R_out", "has_mask",
                     "strided_qr", "B"),
)
def _run_route_stage(x, r1, src, row, r2, mask, n_chunks, R_in, R_out,
                     has_mask, mul=None, strided_qr=0, B=0):
    """One gather-network stage over all chunks. With `B > 0`, `x` (and
    the output) carry a leading replicate axis ([B, n_chunks*R_in, 128],
    strided: [B, n_src, n_dst, Qr, 128]) processed inside each program;
    `mul` stays shared/unbatched."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .gather_pallas import _interpret

    H_in = R_in // LANES
    H_out = R_out // LANES
    has_mul = mul is not None
    assert not (has_mul and strided_qr)
    Bv = max(B, 1)
    esize = x.dtype.itemsize
    per_chunk = (
        Bv * R_in * LANES * esize + (R_in * LANES * esize if has_mul
                                     else 0)  # x (+ shared mul)
        + R_in * LANES  # r1 (i8)
        + (H_out * LANES * LANES if H_in > 1 else 0)  # src
        + H_out * LANES * LANES  # row
        + R_out * LANES  # r2
        + (R_out * LANES if has_mask else 0)  # mask
        + Bv * R_out * LANES * esize  # out
    )
    # heavier unrolled bodies (H_in x H_out gathers) compile slower:
    # cap the batching by body weight as well as VMEM
    cap = 8 if Bv * H_in * H_out <= 8 else 4
    cpp = _chunks_per_program(n_chunks, per_chunk, cap=cap)
    if strided_qr:
        # x arrives as the 4D quota view [n_other, n_chunks, Qr, 128];
        # the block for grid step i is its dst-chunk column slab (the
        # last two dims are whole blocks — a Pallas TPU requirement)
        if B:
            specs = [
                pl.BlockSpec((B, x.shape[1], cpp, strided_qr, LANES),
                             lambda i: (0, 0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            specs = [
                pl.BlockSpec((x.shape[0], cpp, strided_qr, LANES),
                             lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
    elif B:
        specs = [
            pl.BlockSpec((B, cpp * R_in, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        specs = [
            pl.BlockSpec((cpp * R_in, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    args = [x]
    if has_mul:
        specs.append(
            pl.BlockSpec((cpp * R_in, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mul)
    specs.append(
        pl.BlockSpec((cpp, R_in, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(r1)
    if H_in > 1:
        specs.append(
            pl.BlockSpec((cpp, H_out, LANES, LANES),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(src)
    specs.append(
        pl.BlockSpec((cpp, H_out, LANES, LANES), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(row)
    specs.append(
        pl.BlockSpec((cpp, R_out, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(r2)
    if has_mask:
        specs.append(
            pl.BlockSpec((cpp, R_out, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    if B:
        out_shape = jax.ShapeDtypeStruct(
            (B, n_chunks * R_out, LANES), x.dtype
        )
        out_spec = pl.BlockSpec((B, cpp * R_out, LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n_chunks * R_out, LANES),
                                         x.dtype)
        out_spec = pl.BlockSpec((cpp * R_out, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_route_kernel(H_in, H_out, cpp, has_mul, has_mask,
                           strided_qr, B),
        interpret=_interpret(),
        out_shape=out_shape,
        grid=(n_chunks // cpp,),
        in_specs=specs,
        out_specs=out_spec,
    )(*args)


def _make_middle_kernel(H_q: int, H_c: int, cpp: int, has_mult: bool,
                        thresh: float, max_lvl: int,
                        strided_qr: int = 0, B: int = 0):
    """Fused EM middle: per read chunk, gather the (post-transpose)
    quota tensor into chunk space (route A's reduce stage), compute the
    per-read denominators, turn them into guarded reciprocal scales,
    scale the chunk values, and re-expand into route B's quota layout
    (route B's expand stage) — all without touching HBM between the two
    routes. Works because route B's quota layout is exactly the
    transpose of route A's (same flows, identical ranks), so the input
    and output tiles have the same [R_q, 128] shape per chunk.

    Denominators exploit the bucket layout: every read's K slots are K
    CONSECUTIVE kernel rows, K is a power of two, and groups are
    K-aligned (em_v4 `align_groups`). A sublane BUTTERFLY computes, in
    step s, y[r] += y[r XOR 2^(s-1)] (two static-slice rolls + an
    iota-bit select — strictly 2D, Mosaic-friendly), after which y[r]
    is the sum of the aligned 2^s-row span containing r; each row then
    selects the step matching its bucket via a static per-row log2(K)
    table (-1 for non-data rows -> scale 0). Exact f32 adds — no MXU
    one-hot matmul (which at HIGHEST precision cost ~0.5 ms/iter at the
    A=6M bench shape)."""
    R_q = H_q * LANES
    R_c = H_c * LANES

    def kernel(*refs):
        it = iter(refs)
        y_ref = next(it)  # [cpp*R_q, 128] quota values (dst-chunk major)
        lvl_ref = next(it)  # [cpp*R_c, 128] i8 log2(K) per kernel row
        a_r1 = next(it)
        a_src = next(it) if H_q > 1 else None
        a_row = next(it)
        a_r2 = next(it)
        a_mask = next(it)
        b_r1 = next(it)
        b_src = next(it) if H_c > 1 else None
        b_row = next(it)
        b_r2 = next(it)
        mult_ref = next(it) if has_mult else None
        out_ref = next(it)
        for b in range(max(B, 1)):
            for j in range(cpp):
                if strided_qr:
                    ys = y_ref[b, :, j, :, :] if B else y_ref[:, j, :, :]
                    y = ys.reshape(R_q, LANES)
                elif B:
                    y = y_ref[b, j * R_q : (j + 1) * R_q, :]
                else:
                    y = y_ref[j * R_q : (j + 1) * R_q, :]
                x = _stage_apply(
                    y, a_r1[j], None if a_src is None else a_src[j],
                    a_row[j], a_r2[j], a_mask[j], H_q, H_c,
                )  # [R_c, 128] chunk values, non-data slots zero
                # widen i8 -> i32 before comparing (sub-word vector
                # compares are unsupported on this Mosaic target; the
                # convert is fine)
                lvl = lvl_ref[j * R_c : (j + 1) * R_c, :].astype(
                    jnp.int32
                )
                denom = jnp.where(lvl == 0, x, 0.0)
                y = x
                for s in range(1, max_lvl + 1):
                    m = 1 << (s - 1)
                    up = jnp.concatenate([y[m:], y[:m]], axis=0)
                    down = jnp.concatenate([y[-m:], y[:-m]], axis=0)
                    bit = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (R_c, LANES), 0
                        ) & m
                    ) != 0
                    # partner rows never cross an aligned 2^s block, so
                    # the circular wrap rows are never selected
                    y = y + jnp.where(bit, down, up)
                    denom = jnp.where(lvl == s, y, denom)
                scale = jnp.where(denom > thresh, 1.0 / denom, 0.0)
                xs = x * scale
                if has_mult:
                    if B:
                        xs = xs * mult_ref[b, j * R_c : (j + 1) * R_c, :]
                    else:
                        xs = xs * mult_ref[j * R_c : (j + 1) * R_c, :]
                out = _stage_apply(
                    xs, b_r1[j], None if b_src is None else b_src[j],
                    b_row[j], b_r2[j], None, H_c, H_q,
                )
                if B:
                    out_ref[b, j * R_q : (j + 1) * R_q, :] = out
                else:
                    out_ref[j * R_q : (j + 1) * R_q, :] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "R_q", "R_c", "thresh", "max_lvl",
                     "strided_qr", "B"),
)
def _run_middle_stage(y2, lvl, a_r1, a_src, a_row, a_r2, a_mask,
                      b_r1, b_src, b_row, b_r2, n_chunks, R_q, R_c,
                      thresh, max_lvl, mult=None, strided_qr=0, B=0):
    """Fused EM middle over all read chunks. With `B > 0`, `y2`, `mult`
    and the output carry a leading replicate axis processed inside each
    program — the stage tables and lvl are read once per program
    instead of once per replicate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .gather_pallas import _interpret

    H_q = R_q // LANES
    H_c = R_c // LANES
    has_mult = mult is not None
    Bv = max(B, 1)
    esize = y2.dtype.itemsize
    per_chunk = (
        Bv * 2 * R_q * LANES * esize  # y2 + out
        + Bv * R_c * LANES * esize * (1 if has_mult else 0)
        + 3 * R_c * LANES * esize  # pyramid cur/down/denom intermediates
        + (R_q + R_c) * LANES * 2  # r1/r2 tables both stages (i8)
        + (H_c + H_q) * 2 * LANES * LANES  # src/row tables (i8)
        + R_c * LANES * (1 + 1)  # mask (i8) + lvl (i8)
    )
    cap = 4 if Bv * H_q * H_c <= 8 else 2
    cpp = _chunks_per_program(n_chunks, per_chunk, cap=cap)

    def chunked(shape_tail):
        return pl.BlockSpec(
            (cpp,) + shape_tail,
            lambda i: (i,) + (0,) * len(shape_tail),
            memory_space=pltpu.VMEM,
        )

    if strided_qr:
        if B:
            y_spec = pl.BlockSpec(
                (B, y2.shape[1], cpp, strided_qr, LANES),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            y_spec = pl.BlockSpec(
                (y2.shape[0], cpp, strided_qr, LANES),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
    elif B:
        y_spec = pl.BlockSpec((B, cpp * R_q, LANES),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    else:
        y_spec = pl.BlockSpec((cpp * R_q, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    specs = [
        y_spec,
        pl.BlockSpec((cpp * R_c, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        chunked((R_q, LANES)),
    ]
    args = [y2, lvl, a_r1]
    if H_q > 1:
        specs.append(chunked((H_c, LANES, LANES)))
        args.append(a_src)
    specs.append(chunked((H_c, LANES, LANES)))
    args.append(a_row)
    specs.append(chunked((R_c, LANES)))
    args.append(a_r2)
    specs.append(chunked((R_c, LANES)))
    args.append(a_mask)
    specs.append(chunked((R_c, LANES)))
    args.append(b_r1)
    if H_c > 1:
        specs.append(chunked((H_q, LANES, LANES)))
        args.append(b_src)
    specs.append(chunked((H_q, LANES, LANES)))
    args.append(b_row)
    specs.append(chunked((R_q, LANES)))
    args.append(b_r2)
    if has_mult:
        if B:
            specs.append(
                pl.BlockSpec((B, cpp * R_c, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            specs.append(
                pl.BlockSpec((cpp * R_c, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
        args.append(mult)
    if B:
        out_shape = jax.ShapeDtypeStruct(
            (B, n_chunks * R_q, LANES), y2.dtype
        )
        out_spec = pl.BlockSpec((B, cpp * R_q, LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n_chunks * R_q, LANES),
                                         y2.dtype)
        out_spec = pl.BlockSpec((cpp * R_q, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_middle_kernel(H_q, H_c, cpp, has_mult, thresh, max_lvl,
                            strided_qr, B),
        interpret=_interpret(),
        out_shape=out_shape,
        grid=(n_chunks // cpp,),
        in_specs=specs,
        out_specs=out_spec,
    )(*args)


def batched_device_tables(groups, slabs=None):
    """Ship nested groups of host int8 tables to the device in ONE
    transfer. Through the axon tunnel every host->device request pays
    seconds of latency when the link degrades; 18 per-table asarray
    calls turned the cold route build into a round-trip parade
    (route_build_s 137s observed on a degraded tunnel at the 5M
    shape). One concatenated buffer + device-side slices replaces them
    with a single bulk payload; the slices dispatch asynchronously.
    `groups` is a list of lists (None entries preserved); returns the
    same structure holding device arrays. `slabs`, when given, is one
    contiguous int8 buffer per group already holding that group's
    tables in order (GlobalRoute carves its tables from such a slab)
    — the host-side concatenate (~GBs, ~3s at the 5M shape) is
    skipped and the slabs ship as-is (len(groups) requests instead
    of 1; still far from the 18-request parade this replaced)."""
    if slabs is not None:
        bigs = [jnp.asarray(s) for s in slabs]
        out = []
        for g, big in zip(groups, bigs):
            og = []
            off = 0
            for t in g:
                if t is None:
                    og.append(None)
                else:
                    n = int(t.size)
                    og.append(big[off:off + n].reshape(t.shape))
                    off += n
            out.append(og)
        return out
    flat = []
    for g in groups:
        for t in g:
            if t is not None:
                flat.append(np.ascontiguousarray(t).ravel())
    if not flat:
        return [list(g) for g in groups]
    big = jnp.asarray(np.concatenate(flat))
    out = []
    off = 0
    for g in groups:
        og = []
        for t in g:
            if t is None:
                og.append(None)
            else:
                n = int(t.size)
                og.append(big[off:off + n].reshape(t.shape))
                off += n
        out.append(og)
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["s1_r1", "s1_src", "s1_row", "s1_r2", "s3_r1", "s3_src",
                 "s3_row", "s3_r2", "s3_mask"],
    meta_fields=["n_in", "n_out", "n_src", "n_dst", "Q", "R1", "R3",
                 "chunk_rows"],
)
@dataclass(frozen=True)
class GlobalRoutePlan:
    s1_r1: jax.Array  # [n_src, CR, 128] i8
    s1_src: Optional[jax.Array]  # [n_src, H_o, 128, 128] i8 (None: CR=128)
    s1_row: jax.Array  # [n_src, H_o, 128, 128] i8
    s1_r2: jax.Array  # [n_src, R1, 128] i8
    s3_r1: jax.Array  # [n_dst, R3, 128] i8
    s3_src: Optional[jax.Array]  # [n_dst, CR/128, 128, 128] i8
    s3_row: jax.Array  # [n_dst, CR/128, 128, 128] i8
    s3_r2: jax.Array  # [n_dst, CR, 128] i8
    s3_mask: jax.Array  # [n_dst, CR, 128] i8
    n_in: int
    n_out: int
    n_src: int
    n_dst: int
    Q: int
    R1: int
    R3: int
    chunk_rows: int  # CR: 128-lane rows per chunk (CR*128 elements)

    def _pad(self, v: jax.Array) -> jax.Array:
        npad = self.n_src * self.chunk_rows * LANES
        if v.shape[0] == npad:
            return v
        if v.shape[0] > npad:
            return v[:npad]
        return jnp.zeros(npad, v.dtype).at[: v.shape[0]].set(v)

    def expand_y1(self, x: jax.Array,
                  mul: Optional[jax.Array] = None) -> jax.Array:
        """Stage 1 only: chunk space -> PRE-exchange quota tensor
        [n_src * R1, 128] (src-chunk major)."""
        n_src = self.n_src
        CR = self.chunk_rows
        x_pad = self._pad(x).reshape(n_src * CR, LANES)
        mul_pad = None if mul is None else self._pad(mul).reshape(
            n_src * CR, LANES
        )
        return _run_route_stage(
            x_pad, self.s1_r1, self.s1_src, self.s1_row, self.s1_r2,
            None, n_src, CR, self.R1, False, mul=mul_pad,
        )

    def expand(self, x: jax.Array,
               mul: Optional[jax.Array] = None) -> jax.Array:
        """Stage 1 + quota exchange: chunk space -> post-transpose quota
        tensor [n_dst * R3, 128] (dst-chunk major). The chunk counts are
        padded so n_dst*Q == R1*128 and n_src*Q == R3*128 EXACTLY — the
        all-to-all is one pure reshape/transpose/reshape, no slice and
        no zero-pad materialization (saves ~0.7 ms/route at A=6M; see
        scripts/exchange_microbench.py)."""
        n_src, n_dst, Q = self.n_src, self.n_dst, self.Q
        y1 = self.expand_y1(x, mul)
        zg = jnp.transpose(
            y1.reshape(n_src, n_dst, Q), (1, 0, 2)
        )
        return zg.reshape(n_dst * self.R3, LANES)

    def reduce(self, zg: jax.Array, sliced: bool = True) -> jax.Array:
        """Stage 3: post-transpose quota tensor -> chunk space (data
        slots populated, everything else zero)."""
        y3 = _run_route_stage(
            zg, self.s3_r1, self.s3_src, self.s3_row, self.s3_r2,
            self.s3_mask, self.n_dst, self.R3, self.chunk_rows, True,
        )
        out = y3.reshape(-1)
        return out[: self.n_out] if sliced else out

    def expand_y1_batch(self, x_b: jax.Array,
                        mul: Optional[jax.Array] = None) -> jax.Array:
        """Batched `expand_y1`: x_b [B, n] -> [B, n_src*R1, 128]; the
        replicate axis rides inside each kernel program so the stage
        tables are read once per program (not once per replicate).
        `mul` stays shared across replicates."""
        B = x_b.shape[0]
        n_src, CR = self.n_src, self.chunk_rows
        x_pad = jax.vmap(self._pad)(x_b).reshape(B, n_src * CR, LANES)
        mul_pad = None if mul is None else self._pad(mul).reshape(
            n_src * CR, LANES
        )
        return _run_route_stage(
            x_pad, self.s1_r1, self.s1_src, self.s1_row, self.s1_r2,
            None, n_src, CR, self.R1, False, mul=mul_pad, B=B,
        )

    def reduce_strided_batch(self, y1_b: jax.Array,
                             sliced: bool = True) -> jax.Array:
        """Batched `reduce_strided`: y1_b [B, n_src*R1, 128] ->
        [B, n_pad_out] (tail past n_out is zero)."""
        assert self.Q % LANES == 0, "strided exchange needs Q % 128 == 0"
        B = y1_b.shape[0]
        qr = self.Q // LANES
        y3 = _run_route_stage(
            y1_b.reshape(B, self.n_src, self.n_dst, qr, LANES),
            self.s3_r1, self.s3_src, self.s3_row, self.s3_r2,
            self.s3_mask, self.n_dst, self.R3, self.chunk_rows, True,
            strided_qr=qr, B=B,
        )
        out = y3.reshape(B, -1)
        return out[:, : self.n_out] if sliced else out

    def reduce_strided(self, y1: jax.Array,
                       sliced: bool = True) -> jax.Array:
        """Stage 3 consuming the PRE-exchange quota tensor
        [n_src * R1, 128] directly via a strided BlockSpec (each grid
        step DMAs its dst-chunk's Qr-row column slab from every source
        chunk) — no transpose materializes. Requires Q % 128 == 0, so
        the slab is whole lane tiles; the in-VMEM layout is then
        bit-identical to the post-transpose chunk, and the stage tables
        apply unchanged."""
        assert self.Q % LANES == 0, "strided exchange needs Q % 128 == 0"
        qr = self.Q // LANES
        y3 = _run_route_stage(
            y1.reshape(self.n_src, self.n_dst, qr, LANES),
            self.s3_r1, self.s3_src, self.s3_row, self.s3_r2,
            self.s3_mask, self.n_dst, self.R3, self.chunk_rows, True,
            strided_qr=qr,
        )
        out = y3.reshape(-1)
        return out[: self.n_out] if sliced else out

    def __call__(self, x: jax.Array, mul: Optional[jax.Array] = None,
                 sliced: bool = True) -> jax.Array:
        """Route `x` (elementwise-multiplied by `mul` inside the expand
        kernel when given — saves materializing the product in HBM).
        With `sliced=False` the full padded output is returned (the tail
        past `n_out` is zero); callers that index absolute slot ranges
        can skip the slice copy."""
        return self.reduce(self.expand(x, mul), sliced=sliced)


class GlobalRoute:
    """out[out_idx[k]] = x[in_idx[k]] for a static partial injective map
    over [0, n_pad); all other outputs are ZERO. No pad routing, no
    bijection completion: quota slots not covered by data carry garbage
    that is never read back, and output pads are zeroed by a static
    mask. Use `.plan` (a pytree) inside jitted code.

    `chunk_rows` sets the route-chunk size (chunk_rows*128 elements).
    Larger chunks average the per-(src,dst) flows toward their mean
    (Poisson concentration: the quota Q must cover the MAX flow, and at
    chunk=16384 the max sits ~3x above the mean at A=6M), shrinking the
    quota tensor — at the cost of H_in x H_out gather/select work in
    the stage kernels."""

    def __init__(self, out_idx: np.ndarray, in_idx: np.ndarray, n_pad: int,
                 n_out: Optional[int] = None,
                 force_geometry: Optional[Tuple[int, ...]] = None,
                 chunk_rows: int = LANES,
                 n_pad_out: Optional[int] = None,
                 _defer: bool = False):
        out_idx = np.asarray(out_idx, dtype=np.int64)
        in_idx = np.asarray(in_idx, dtype=np.int64)
        CR = int(chunk_rows)
        assert CR % LANES == 0
        CHR = CR * LANES  # elements per chunk
        assert n_pad % CHR == 0, (n_pad, CHR)
        if n_pad_out is None:
            n_pad_out = n_pad
        assert n_pad_out % CHR == 0, (n_pad_out, CHR)
        n_ch = n_pad // CHR
        n_ch_out = n_pad_out // CHR
        maxflow = route_maxflow(out_idx, in_idx, n_pad, chunk=CHR,
                                n_pad_out=n_pad_out)
        if force_geometry is not None:
            # shared geometry across shard-uniform plans (sharded v4):
            # every shard's routing arrays must have identical shapes.
            # (npd, Q) for square plans; (n_src, n_dst, Q) rectangular.
            if len(force_geometry) == 2:
                npd, Q = force_geometry
                n_src = n_dst = npd
            else:
                n_src, n_dst, Q = force_geometry
            assert n_src >= n_ch and n_dst >= n_ch_out and Q >= maxflow, (
                n_src, n_dst, Q, n_ch, n_ch_out, maxflow
            )
            assert n_src * Q % (LANES * LANES) == 0
            assert n_dst * Q % (LANES * LANES) == 0
        else:
            assert n_pad_out == n_pad, (
                "rectangular routes require force_geometry"
            )
            npd, Q = select_route_geometry(n_ch, maxflow)
            n_src = n_dst = npd
        R1 = n_dst * Q // LANES  # stage-1 quota rows per chunk
        R3 = n_src * Q // LANES
        assert R1 % LANES == 0 and R3 % LANES == 0
        if max(R1, R3) // LANES > 16:
            raise ValueError(
                f"GlobalRoute degenerate: H={max(R1, R3) // LANES} "
                f"(Q={Q}, n_chunks={n_src}); use a plain gather instead"
            )
        self.n_in = n_pad
        self.n_out = n_out if n_out is not None else n_pad_out
        self.n_src, self.n_dst, self.Q = n_src, n_dst, Q
        self.R1, self.R3 = R1, R3
        self.chunk_rows = CR

        H_in_gt1 = CR > LANES
        # all 9 tables are carved as views from ONE contiguous slab so
        # the single-transfer device ship (batched_device_tables) can
        # send the slab directly instead of re-concatenating ~GBs of
        # int8 (the concat was ~3s of the 5M cold routes.join)
        shapes = [
            (n_src, CR, LANES),
            (n_src, R1 // LANES, LANES, LANES) if H_in_gt1 else None,
            (n_src, R1 // LANES, LANES, LANES),
            (n_src, R1, LANES),
            (n_dst, R3, LANES),
            (n_dst, CR // LANES, LANES, LANES),
            (n_dst, CR // LANES, LANES, LANES),
            (n_dst, CR, LANES),
            (n_dst, CR, LANES),
        ]
        sizes = [0 if s is None else int(np.prod(s)) for s in shapes]
        self._slab = np.zeros(sum(sizes), dtype=np.int8)
        tables = []
        off = 0
        for s, n in zip(shapes, sizes):
            tables.append(
                None if s is None
                else self._slab[off:off + n].reshape(s)
            )
            off += n
        self._tables = tuple(tables)
        self._out_idx, self._in_idx = out_idx, in_idx
        if not _defer:
            self._fill_tables()
            self._finalize()

    def _fill_tables(self):
        """Populate the nine routing tables (native fast path, NumPy
        fallback). Split out of __init__ so `GlobalRoute.pair` can fill
        a forward/reverse pair with one shared native build."""
        out_idx, in_idx = self._out_idx, self._in_idx
        (s1_r1, s1_src, s1_row, s1_r2,
         s3_r1, s3_src, s3_row, s3_r2, s3_mask) = self._tables
        CR = self.chunk_rows
        CHR = CR * LANES
        n_src, n_dst, Q = self.n_src, self.n_dst, self.Q
        R1, R3 = self.R1, self.R3
        H_in_gt1 = CR > LANES
        d_of = out_idx // CHR
        s_of = in_idx // CHR

        # Fast path: the ENTIRE table build (flow ranks by counting
        # sort, per-chunk 128-edge-coloring on a thread pool, table
        # scatters) in one native call — the NumPy fallback below
        # spends seconds on argsorts and 6M-element index temporaries
        # at the A=6M bench shape.
        if not route_tables_native(
            out_idx, in_idx, CR, n_src, n_dst, Q,
            (s1_r1, s1_src, s1_row, s1_r2,
             s3_r1, s3_src, s3_row, s3_r2, s3_mask),
        ):
            # rank within each (s,d) flow (stable argsort on the
            # combined key == lexsort by (s_of, d_of, position))
            E = len(out_idx)
            order = np.argsort(s_of * n_dst + d_of, kind="stable")
            sd = s_of[order] * n_dst + d_of[order]
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(sd))[0] + 1]
            )
            gid = np.zeros(E, dtype=np.int64)
            gid[starts] = 1
            gid = np.cumsum(gid) - 1
            rank = np.zeros(E, dtype=np.int64)
            rank[order] = np.arange(E) - starts[gid]
            q_slot = d_of * Q + rank  # within src chunk quota space
            q3_slot = s_of * Q + rank  # within dst chunk (post-exch.)

            # Batched channel coloring + flat-index table scatters
            # (one advanced-index assignment per table on the raveled
            # array). `order` is already grouped by src chunk, so it
            # is the stage-1 batch order. All flat indices fit int32.
            H1 = R1 // LANES
            sb = np.searchsorted(s_of[order], np.arange(n_src + 1))
            cid = s_of[order].astype(np.int32)
            io = in_idx[order].astype(np.int32)
            in_row = (io % CHR) // LANES
            qo = q_slot[order].astype(np.int32)
            q_row = qo // LANES
            q_rm = q_row % LANES
            c1 = edge_color_batch(in_row, q_row, sb, max(CR, R1), LANES)
            s1_r1.reshape(-1)[
                (cid * CR + in_row) * LANES + c1
            ] = io % LANES
            mid1 = (
                (cid * H1 + q_row // LANES) * LANES + c1
            ) * LANES + q_rm
            if H_in_gt1:
                s1_src.reshape(-1)[mid1] = in_row // LANES
            s1_row.reshape(-1)[mid1] = in_row % LANES
            s1_r2.reshape(-1)[
                (cid * R1 + q_row) * LANES + qo % LANES
            ] = c1

            H3 = CR // LANES
            do = np.argsort(d_of, kind="stable")
            db = np.searchsorted(d_of[do], np.arange(n_dst + 1))
            did = d_of[do].astype(np.int32)
            q3o = q3_slot[do].astype(np.int32)
            q3_row = q3o // LANES
            oo = out_idx[do].astype(np.int32)
            o_row = (oo % CHR) // LANES
            o_flat = (did * CR + o_row) * LANES + oo % LANES
            c3 = edge_color_batch(q3_row, o_row, db, max(R3, CR), LANES)
            s3_r1.reshape(-1)[
                (did * R3 + q3_row) * LANES + c3
            ] = q3o % LANES
            mid3 = (
                ((did * H3 + o_row // LANES) * LANES + c3) * LANES
                + o_row % LANES
            )
            s3_src.reshape(-1)[mid3] = q3_row // LANES
            s3_row.reshape(-1)[mid3] = q3_row % LANES
            s3_r2.reshape(-1)[o_flat] = c3
            s3_mask.reshape(-1)[o_flat] = 1

    def _finalize(self, dev_tables=None):
        (s1_r1, s1_src, s1_row, s1_r2,
         s3_r1, s3_src, s3_row, s3_r2, s3_mask) = self._tables
        n_src, n_dst, Q = self.n_src, self.n_dst, self.Q
        R1, R3, CR = self.R1, self.R3, self.chunk_rows
        slab = self._slab
        del self._tables, self._slab, self._out_idx, self._in_idx
        if dev_tables is None:
            (dev_tables,) = batched_device_tables(
                [[s1_r1, s1_src, s1_row, s1_r2,
                  s3_r1, s3_src, s3_row, s3_r2, s3_mask]],
                slabs=[slab],
            )
        (s1_r1, s1_src, s1_row, s1_r2,
         s3_r1, s3_src, s3_row, s3_r2, s3_mask) = dev_tables
        self.plan = GlobalRoutePlan(
            s1_r1=s1_r1,
            s1_src=s1_src,
            s1_row=s1_row,
            s1_r2=s1_r2,
            s3_r1=s3_r1,
            s3_src=s3_src,
            s3_row=s3_row,
            s3_r2=s3_r2,
            s3_mask=s3_mask,
            n_in=self.n_in,
            n_out=self.n_out,
            n_src=n_src,
            n_dst=n_dst,
            Q=Q,
            R1=R1,
            R3=R3,
            chunk_rows=CR,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.plan(x)


def build_route_pair(
    out_idx: np.ndarray,
    in_idx: np.ndarray,
    n_pad: int,
    force_geometry: Optional[Tuple[int, ...]] = None,
    chunk_rows: int = LANES,
    n_pad_out: Optional[int] = None,
) -> Tuple[GlobalRoutePlan, GlobalRoutePlan]:
    """Build the forward route (out_idx <- in_idx) AND its reverse
    (in_idx <- out_idx) with ONE shared native table build. The reverse
    route's per-chunk channel graphs are the forward's with edge
    direction flipped (identical flows and ranks), so each chunk side is
    edge-colored once instead of twice — the colorings dominate the
    table-build cost (~2.1 s per route at the A=6M bench shape on 4
    cores). Returns (fwd.plan, rev.plan); falls back to two independent
    builds when the native pair entry point is unavailable."""
    handle = build_route_pair_async(
        out_idx, in_idx, n_pad, force_geometry=force_geometry,
        chunk_rows=chunk_rows, n_pad_out=n_pad_out,
    )
    return handle()


def build_route_pair_async(
    out_idx: np.ndarray,
    in_idx: np.ndarray,
    n_pad: int,
    force_geometry: Optional[Tuple[int, ...]] = None,
    chunk_rows: int = LANES,
    n_pad_out: Optional[int] = None,
    keep_host: bool = False,
):
    """`build_route_pair` with the heavy table fill running on a worker
    thread (the native entry point releases the GIL and runs its own
    pool). Geometry is resolved EAGERLY — `handle.n_src/.n_dst/.Q/
    .chunk_rows` are valid immediately — so the caller can build and
    device-transfer everything geometry-dependent (w_txp, seg_id)
    concurrently with the coloring. Call the handle to join and get
    (fwd.plan, rev.plan). With `keep_host=True` the host-side tables
    survive as `handle.host` (for the persistent plan cache)."""
    import threading

    from .permute_plan import route_tables_pair_native

    fwd = GlobalRoute(out_idx, in_idx, n_pad,
                      force_geometry=force_geometry,
                      chunk_rows=chunk_rows, n_pad_out=n_pad_out,
                      _defer=True)
    n_pad_fwd_out = n_pad if n_pad_out is None else n_pad_out
    rev = GlobalRoute(in_idx, out_idx, n_pad_fwd_out,
                      force_geometry=(fwd.n_dst, fwd.n_src, fwd.Q),
                      chunk_rows=chunk_rows, n_pad_out=n_pad,
                      _defer=True)
    state = {}

    def fill():
        try:
            if not route_tables_pair_native(
                out_idx, in_idx, chunk_rows, fwd.n_src, fwd.n_dst, fwd.Q,
                fwd._tables, rev._tables,
            ):
                fwd._fill_tables()
                rev._fill_tables()
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            state["err"] = e

    th = threading.Thread(target=fill, daemon=True)
    th.start()

    def handle():
        th.join()
        if "err" in state:
            raise state["err"]
        if keep_host:
            handle.host = tuple(
                {
                    "tables": r._tables,
                    "meta": (r.n_in, r.n_out, r.n_src, r.n_dst, r.Q,
                             r.R1, r.R3, r.chunk_rows),
                }
                for r in (fwd, rev)
            )
        devs = batched_device_tables(
            [fwd._tables, rev._tables], slabs=[fwd._slab, rev._slab]
        )
        fwd._finalize(dev_tables=devs[0])
        rev._finalize(dev_tables=devs[1])
        return fwd.plan, rev.plan

    handle.n_src, handle.n_dst = fwd.n_src, fwd.n_dst
    handle.Q, handle.chunk_rows = fwd.Q, fwd.chunk_rows
    return handle

