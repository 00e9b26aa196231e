"""Sharded (multi-device) EM vs the single-device path and the oracle,
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from oarfish_tpu.ops.em_oracle import do_em_oracle
from oarfish_tpu.parallel.sharded_em import ShardedCsr, sharded_em
from test_em import random_csr


def test_shard_partitioning():
    rng = np.random.default_rng(0)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=100, T=20)
    sh = ShardedCsr(txp_id, w, boundaries, T, 4)
    # ranges tile [0, R)
    assert sh.read_ranges[0][0] == 0 and sh.read_ranges[-1][1] == R
    for (s0, e0), (s1, e1) in zip(sh.read_ranges, sh.read_ranges[1:]):
        assert e0 == s1
    # every real alignment present exactly once, weights preserved
    total_real = sum(
        int((sh.read_id[d] <= sh.r_pad - 1).sum() if False else (sh.weights[d] != 0).sum())
        for d in range(4)
    )
    assert total_real == (w != 0).sum()


def test_sharded_em_matches_oracle():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(1)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=500, T=60)
    init = np.full(T, R / T, dtype=np.float64)
    counts, niter = sharded_em(
        txp_id, w, boundaries, T, init, max_iter=200,
        convergence_thresh=1e-3, dtype=jnp.float64,
    )
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=200)
    np.testing.assert_allclose(counts, want, rtol=1e-9, atol=1e-9)
    assert niter > 50


def test_sharded_em_various_shard_counts():
    rng = np.random.default_rng(2)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=203, T=30)
    init = np.full(T, R / T, dtype=np.float64)
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=120)
    for D in (1, 2, 3, 8):
        counts, _ = sharded_em(
            txp_id, w, boundaries, T, init, max_iter=120,
            convergence_thresh=1e-3, dtype=jnp.float64, num_shards=D,
        )
        np.testing.assert_allclose(counts, want, rtol=1e-9, atol=1e-9,
                                   err_msg=f"shards={D}")


def test_global_assembly_path_matches_oracle():
    """Multi-host-style global array assembly (one shard per device via
    make_array_from_single_device_arrays) produces identical results."""
    from oarfish_tpu.parallel.multihost import (
        global_data_mesh,
        sharded_em_global,
    )

    rng = np.random.default_rng(5)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=400, T=50)
    init = np.full(T, R / T, dtype=np.float64)
    counts, niter = sharded_em_global(
        txp_id, w, boundaries, T, init, max_iter=150,
        convergence_thresh=1e-3, dtype=jnp.float64,
        mesh=global_data_mesh(),
    )
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=150)
    np.testing.assert_allclose(counts, want, rtol=1e-9, atol=1e-9)


def test_global_assembly_honors_accel():
    """`--em-accel squarem` must reach the global-mesh EM (it was
    silently dropped): the accelerated run lands at the same fixed point
    as plain EM at a tight threshold."""
    import jax

    from oarfish_tpu.parallel.multihost import (
        global_data_mesh,
        sharded_em_global,
    )

    rng = np.random.default_rng(8)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=300, T=40)
    init = np.full(T, R / T, dtype=np.float64)
    kw = dict(max_iter=600, convergence_thresh=1e-7, dtype=jnp.float64,
              mesh=global_data_mesh())
    c_plain, n_plain = sharded_em_global(
        txp_id, w, boundaries, T, init, **kw
    )
    c_sq, n_sq = sharded_em_global(
        txp_id, w, boundaries, T, init, accel="squarem", **kw
    )
    np.testing.assert_allclose(c_sq, c_plain, rtol=1e-5, atol=1e-5)


def test_sharded_squarem_matches_unsharded():
    """SQUAREM over the mesh (segsum + v4) reaches the unsharded
    accelerated fixed point; per-shard psum summation order makes the
    trajectories diverge microscopically, so fixed-point tolerance."""
    import jax.numpy as jnp
    import numpy as np

    from oarfish_tpu.ops.em import EmData, run_em_squarem
    from oarfish_tpu.parallel.sharded_em import sharded_em
    from oarfish_tpu.parallel.sharded_v4 import sharded_v4_em

    rng = np.random.default_rng(3)
    R, T = 8000, 400
    sizes = rng.integers(2, 7, size=R)
    A = int(sizes.sum())
    bd = np.zeros(R + 1, np.int64)
    np.cumsum(sizes, out=bd[1:])
    base = rng.integers(0, T - 8, size=R)
    tid = (
        np.repeat(base, sizes)
        + np.concatenate([np.arange(s) for s in sizes])
    )
    w = np.exp(rng.normal(0, 0.05, A))
    read_id = np.repeat(np.arange(R, dtype=np.int32), sizes)
    init = np.full(T, R / T, np.float64)

    data = EmData.build(tid, w, read_id, R, T, dtype=jnp.float64)
    c_ref, n_ref = run_em_squarem(data, jnp.asarray(init), 800, 1e-5)
    c_sh, n_sh = sharded_em(
        tid, w, bd, T, init, max_iter=800, convergence_thresh=1e-5,
        dtype=jnp.float64, num_shards=8, accel="squarem",
    )
    np.testing.assert_allclose(
        np.asarray(c_sh), np.asarray(c_ref), rtol=2e-3, atol=0.01
    )
    # plain EM on this slow-mixing problem needs >2x the m-steps
    c_pl, n_pl = sharded_em(
        tid, w, bd, T, init, max_iter=800, convergence_thresh=1e-5,
        dtype=jnp.float64, num_shards=8,
    )
    assert int(n_sh) < int(n_pl) // 2, (int(n_sh), int(n_pl))
    c4, n4 = sharded_v4_em(
        tid, w, bd, T, init, max_iter=800, convergence_thresh=1e-5,
        dtype=jnp.float64, num_shards=8, accel="squarem",
    )
    np.testing.assert_allclose(
        np.asarray(c4), np.asarray(c_ref), rtol=2e-3, atol=0.01
    )
