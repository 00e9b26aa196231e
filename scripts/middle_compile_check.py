"""Compile-and-run the fused middle kernel on the real TPU at a small
shape; prints the full Mosaic diagnostics on failure."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from oarfish_tpu.ops.em_v4 import EmV4Data, _m_step_v4


def main():
    rng = np.random.default_rng(3)
    R, T, max_k = 400_000, 3_000, 6
    sizes = rng.integers(1, max_k + 1, size=R)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    txp_id = rng.integers(0, T, size=A).astype(np.int32)
    w = np.exp(rng.normal(0, 1, size=A)).astype(np.float32)
    data, _ = EmV4Data.build(txp_id, w, boundaries, T)
    print("middle_available:", data.seg_id is not None, flush=True)
    prev = jnp.full(T, float(R) / T, dtype=jnp.float32)
    out = jax.jit(lambda d, p: _m_step_v4(d, p, None))(data, prev)
    got = np.asarray(out, dtype=np.float64)
    print("ok sum:", got.sum(), "expected ~", R, flush=True)


if __name__ == "__main__":
    main()
