"""2D KDE fragment-length model (the hidden `--use-kde` flag).

Equivalent of `kde_utils.rs:6-45` + the external `kders` crate: a 2D grid
over (transcript length, alignment length), bin width 25, Gaussian kernel
bandwidth 50, observations weighted 1/num_alignments per read. The blur is
a separable Gaussian convolution evaluated in JAX (device) since it is a
dense stencil op. The resulting density is looked up per alignment at
`(txp_len, aln_len)` and folded into the per-alignment EM weight (the
density is constant across EM iterations, `em.rs:173-178`).
"""

from __future__ import annotations

import numpy as np

from ..host.store import AlignmentStore

BIN_WIDTH = 25
BANDWIDTH = 50.0


class KdeModel:
    def __init__(self, grid: np.ndarray, width: int, height: int):
        self.grid = grid  # [nx, ny] density, sums to 1
        self.width = width
        self.height = height

    def lookup(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        bx = np.minimum(np.asarray(x) // BIN_WIDTH, self.grid.shape[0] - 1)
        by = np.minimum(np.asarray(y) // BIN_WIDTH, self.grid.shape[1] - 1)
        return self.grid[bx, by]


def _gaussian_kernel_1d(sigma_bins: float) -> np.ndarray:
    radius = max(int(np.ceil(3 * sigma_bins)), 1)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma_bins) ** 2)
    return k / k.sum()


def get_kde_model(
    store: AlignmentStore, txp_lenf: np.ndarray
) -> KdeModel:
    """Build the KDE over (txp_len, aln_span) observations
    (`kde_utils.rs:6-45`): grid maxima from the data, weight 1/n_alns per
    read, Gaussian blur, normalized to a density."""
    tlen = txp_lenf[store.txp_id]
    # AlnInfo::alignment_span == end - start (`oarfish_types.rs:341-343`)
    aln_len = (store.end - store.start).astype(np.float64)
    max_x = float(tlen.max()) if len(tlen) else 0.0
    max_y = float(aln_len.max()) if len(aln_len) else 0.0
    width = int(max_x) + 1
    height = int(max_y) + 1
    nx = width // BIN_WIDTH + 1
    ny = height // BIN_WIDTH + 1

    sizes = np.diff(store.boundaries)
    w = np.repeat(1.0 / np.maximum(sizes, 1), sizes)

    grid = np.zeros((nx, ny), dtype=np.float64)
    bx = (tlen.astype(np.int64)) // BIN_WIDTH
    by = (aln_len.astype(np.int64)) // BIN_WIDTH
    np.add.at(grid, (bx, by), w)

    k = _gaussian_kernel_1d(BANDWIDTH / BIN_WIDTH)
    # separable blur along both axes
    grid = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 1, grid
    )
    grid = np.apply_along_axis(
        lambda c: np.convolve(c, k, mode="same"), 0, grid
    )
    s = grid.sum()
    if s > 0:
        grid = grid / s
    return KdeModel(grid, width, height)
