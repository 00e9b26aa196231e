"""NumPy float64 oracle of the reference EM (serial `do_em` semantics).

This is the parity yardstick: it reproduces `src/em.rs:87-255` —
the fused E/M step, the signed max-relative-diff convergence rule with the
`niter > 50` guard, the final zero-below-1e-5 + one extra M step — in exact
f64, read-group order. The JAX/Pallas device kernels are validated against
this (the reference's *parallel* path is nondeterministic by construction,
`em.rs:74`, so the serial path is the parity target; see SURVEY §3.5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..constants import EM_DENOM_THRESH, MIN_READ_THRESH


def m_step_oracle(
    txp_id: np.ndarray,
    weights: np.ndarray,
    boundaries: np.ndarray,
    prev: np.ndarray,
    multiplicity: Optional[np.ndarray] = None,
) -> np.ndarray:
    """One fused E/M step (`em.rs:87-133`). `weights` is the per-alignment
    product prob*cov_prob*dens_prob (all constant across iterations).
    `multiplicity` (bootstrap) scales each read's contribution."""
    curr = np.zeros_like(prev)
    R = len(boundaries) - 1
    for r in range(R):
        s, e = boundaries[r], boundaries[r + 1]
        t = txp_id[s:e]
        contrib = prev[t] * weights[s:e]
        denom = contrib.sum()
        if denom > EM_DENOM_THRESH:
            inc = contrib / denom
            if multiplicity is not None:
                inc = inc * multiplicity[r]
            np.add.at(curr, t, inc)
    return curr


def do_em_oracle(
    txp_id: np.ndarray,
    weights: np.ndarray,
    boundaries: np.ndarray,
    num_txps: int,
    max_iter: int = 1000,
    convergence_thresh: float = 1e-3,
    init_abundances: Optional[np.ndarray] = None,
    multiplicity: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Full serial EM (`em.rs:144-255`). Returns expected read counts."""
    R = len(boundaries) - 1
    total_weight = float(R) if multiplicity is None else float(multiplicity.sum())
    if init_abundances is not None:
        prev = init_abundances.astype(np.float64).copy()
    else:
        prev = np.full(num_txps, total_weight / num_txps, dtype=np.float64)

    niter = 0
    while niter < max_iter:
        curr = m_step_oracle(txp_id, weights, boundaries, prev, multiplicity)
        mask = prev > MIN_READ_THRESH
        rel_diff = 0.0
        if mask.any():
            rd = (curr[mask] - prev[mask]) / prev[mask]
            rel_diff = max(rel_diff, float(rd.max()))
        prev = curr
        if rel_diff < convergence_thresh and niter > 50:
            break
        niter += 1

    prev[prev < MIN_READ_THRESH] = 0.0
    return m_step_oracle(txp_id, weights, boundaries, prev, multiplicity)


def combine_weights(
    as_prob: np.ndarray,
    cov_prob: Optional[np.ndarray],
    model_coverage: bool,
    dens_prob: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fold the (constant) per-alignment factors into one weight vector:
    `prob * cov_prob * dens_prob` from `em.rs:97-111`. The KDE density and
    the coverage probability depend only on fixed per-alignment data, so
    they never change across EM iterations."""
    w = as_prob.astype(np.float64)
    if model_coverage and cov_prob is not None:
        w = w * cov_prob.astype(np.float64)
    if dens_prob is not None:
        w = w * dens_prob.astype(np.float64)
    return w
