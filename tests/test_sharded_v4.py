"""Sharded (data-parallel) v4 EM on the virtual 8-device CPU mesh.

The per-shard EmV4Data states are built inside a merged envelope with a
forced common route geometry (parallel/sharded_v4.py); the whole EM
while-loop runs in one shard_map program with one psum per iteration.
Differential-tested against the serial NumPy oracle (reference serial
semantics, em.rs:144-255) and against the single-device v4 runner.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oarfish_tpu.ops.em_oracle import do_em_oracle
from test_em import random_csr


def _skewed_csr(rng, R, T, max_k):
    txp_id, w, boundaries, read_id, R, T = random_csr(
        rng, R=R, T=T, max_k=max_k
    )
    txp_id = (rng.zipf(1.3, size=len(txp_id)) % T).astype(np.int32)
    return txp_id, w, boundaries, read_id, R, T


@pytest.mark.parametrize("num_shards", [2, 4])
def test_sharded_v4_vs_oracle(num_shards):
    from oarfish_tpu.parallel.sharded_v4 import sharded_v4_em

    rng = np.random.default_rng(21)
    txp_id, w, boundaries, read_id, R, T = _skewed_csr(
        rng, R=50_000, T=2_000, max_k=4
    )
    init = np.full(T, R / T)
    counts, niter = sharded_v4_em(
        txp_id, w, boundaries, T, init,
        max_iter=12, convergence_thresh=5e-3,
        dtype=jnp.float64, num_shards=num_shards,
    )
    want = do_em_oracle(
        txp_id, w, boundaries, T, max_iter=12, convergence_thresh=5e-3
    )
    assert abs(counts.sum() - want.sum()) < 1e-6 * R
    # f64 exact semantics; only summation ORDER differs (per-shard row
    # sums + psum vs the oracle's serial scatter), amplified across the
    # 40 EM iterations
    np.testing.assert_allclose(counts, want, rtol=1e-5, atol=1e-6)


def test_sharded_v4_envelope_uniformity():
    """Shards with very different size distributions still build under
    one envelope/geometry (big transcripts present in one shard only)."""
    from oarfish_tpu.parallel.sharded_v4 import ShardedV4

    rng = np.random.default_rng(22)
    txp_id, w, boundaries, read_id, R, T = random_csr(
        rng, R=80_000, T=500, max_k=6
    )
    # concentrate one hot transcript in the FIRST half of the reads so
    # one shard has a >CAPK transcript and the other does not
    half = len(txp_id) // 2
    txp_id = txp_id.copy()
    txp_id[:4000] = 7
    sh = ShardedV4(txp_id, w, boundaries, T, 2)
    # stacked leading axis on every data leaf
    import jax

    for leaf in jax.tree_util.tree_leaves(sh.data):
        assert leaf.shape[0] == 2


def test_sharded_v4_bootstrap_batch_matches_single():
    """Vmapped replicate batches over the mesh reproduce the
    single-device per-replicate runs (same multiplicity vectors)."""
    from oarfish_tpu.ops.em_v4 import EmV4Data, make_runner
    from oarfish_tpu.parallel.sharded_v4 import (
        build_sharded_v4,
        sharded_v4_bootstrap,
    )

    rng = np.random.default_rng(29)
    txp_id, w, boundaries, read_id, R, T = _skewed_csr(
        rng, R=40_000, T=800, max_k=4
    )
    B = 3
    mult = rng.multinomial(R, np.full(R, 1.0 / R), size=B).astype(
        np.float64
    )
    init = np.full(T, R / T)

    sh, mesh = build_sharded_v4(txp_id, w, boundaries, T, num_shards=4)
    breps = sharded_v4_bootstrap(
        sh, mesh, init, mult, max_iter=8, convergence_thresh=5e-3,
        dtype=jnp.float64, batch=2,  # exercises the padded last batch
    )
    assert breps.shape == (B, T)

    data, order = EmV4Data.build(txp_id, w, boundaries, T)
    runner = make_runner(data)
    for b in range(B):
        counts_1, _ = runner(
            jnp.asarray(init, dtype=jnp.float64), 8, 5e-3,
            multiplicity=jnp.asarray(mult[b][order], dtype=jnp.float64),
        )
        np.testing.assert_allclose(
            breps[b], np.asarray(counts_1), rtol=1e-8, atol=1e-8
        )


def test_sharded_v4_multiplicity_matches_single():
    """A bootstrap-style multiplicity vector gives the same result
    sharded as on the single-device v4 runner."""
    from oarfish_tpu.ops.em_v4 import EmV4Data, make_runner
    from oarfish_tpu.parallel.sharded_v4 import sharded_v4_em

    rng = np.random.default_rng(23)
    txp_id, w, boundaries, read_id, R, T = _skewed_csr(
        rng, R=60_000, T=1_000, max_k=4
    )
    mult = rng.poisson(1.0, size=R).astype(np.float64)
    init = np.full(T, R / T)

    counts_sh, niter_sh = sharded_v4_em(
        txp_id, w, boundaries, T, init,
        max_iter=10, convergence_thresh=5e-3,
        dtype=jnp.float64, num_shards=4, multiplicity=mult,
    )

    data, order = EmV4Data.build(txp_id, w, boundaries, T)
    runner = make_runner(data)
    counts_1, niter_1 = runner(
        jnp.asarray(init, dtype=jnp.float64), 10, 5e-3,
        multiplicity=jnp.asarray(mult[order], dtype=jnp.float64),
    )
    np.testing.assert_allclose(
        counts_sh, np.asarray(counts_1), rtol=1e-8, atol=1e-8
    )
    assert int(niter_sh) == int(niter_1)
