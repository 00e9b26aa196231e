"""Device EM vs the NumPy f64 oracle (serial reference semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oarfish_tpu.ops.em import EmData, em, run_em, uniform_init
from oarfish_tpu.ops.em_oracle import do_em_oracle, m_step_oracle


def random_csr(rng, R=300, T=40, max_k=8):
    sizes = rng.integers(1, max_k + 1, size=R)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    txp_id = rng.integers(0, T, size=A).astype(np.int32)
    w = np.exp(rng.normal(0, 1, size=A)).astype(np.float64)
    read_id = np.repeat(np.arange(R, dtype=np.int32), sizes)
    return txp_id, w, boundaries, read_id, R, T


def test_m_step_matches_oracle_f64():
    rng = np.random.default_rng(0)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng)
    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float64)
    prev = np.exp(rng.normal(0, 1, size=T))
    from oarfish_tpu.ops.em import _m_step

    got = np.asarray(_m_step(data, jnp.asarray(prev), None))
    want = m_step_oracle(txp_id, w, boundaries, prev)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_em_matches_oracle_f64():
    rng = np.random.default_rng(1)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng)
    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float64)
    counts, niter = em(data, max_iter=200, convergence_thresh=1e-3,
                       dtype=jnp.float64)
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=200,
                        convergence_thresh=1e-3)
    np.testing.assert_allclose(counts, want, rtol=1e-9, atol=1e-9)
    # mass conservation: reads with positive denominators are fully assigned
    assert counts.sum() == pytest.approx(R, rel=1e-9)
    assert niter > 50  # early-stop guard requires niter > 50


def test_em_f32_close_to_oracle():
    rng = np.random.default_rng(2)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=2000, T=100)
    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float32)
    counts, _ = em(data, max_iter=200, convergence_thresh=1e-3,
                   dtype=jnp.float32)
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=200,
                        convergence_thresh=1e-3)
    # f32 path: small relative L1 error against the f64 oracle
    l1 = np.abs(counts - want).sum() / want.sum()
    assert l1 < 1e-3


def test_em_denominator_guard():
    # one read with all-zero weights must be dropped (denom <= 1e-30)
    txp_id = np.array([0, 1, 0], dtype=np.int32)
    w = np.array([0.0, 0.0, 1.0])
    boundaries = np.array([0, 2, 3], dtype=np.int64)
    read_id = np.array([0, 0, 1], dtype=np.int32)
    data = EmData.build(txp_id, w, read_id, 2, 2, dtype=jnp.float64)
    counts, _ = em(data, max_iter=60, dtype=jnp.float64)
    want = do_em_oracle(txp_id, w, boundaries, 2, max_iter=60)
    np.testing.assert_allclose(counts, want)
    assert counts.sum() == pytest.approx(1.0)


def test_em_init_abundances():
    rng = np.random.default_rng(3)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng)
    init = np.abs(rng.normal(10, 3, size=T))
    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float64)
    counts, _ = em(data, max_iter=100, init_abundances=init, dtype=jnp.float64)
    want = do_em_oracle(txp_id, w, boundaries, T, max_iter=100,
                        init_abundances=init)
    np.testing.assert_allclose(counts, want, rtol=1e-9, atol=1e-9)


def test_em_multiplicity_equals_resampled_reads():
    """Multinomial multiplicity weighting == duplicating read groups
    (the bootstrap equivalence, `bootstrap.rs:7-16`)."""
    rng = np.random.default_rng(4)
    txp_id, w, boundaries, read_id, R, T = random_csr(rng, R=50, T=10)
    mult = rng.multinomial(R, np.full(R, 1.0 / R)).astype(np.float64)

    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float64)
    init = uniform_init(data, jnp.float64)
    counts, _ = run_em(data, init, 100, 1e-3, multiplicity=jnp.asarray(mult))
    counts = np.asarray(counts)

    # oracle: physically duplicate each read group `mult[r]` times
    t2, w2, sizes = [], [], []
    for r in range(R):
        s, e = boundaries[r], boundaries[r + 1]
        for _ in range(int(mult[r])):
            t2.append(txp_id[s:e])
            w2.append(w[s:e])
            sizes.append(e - s)
    b2 = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=b2[1:])
    want = do_em_oracle(np.concatenate(t2), np.concatenate(w2), b2, T,
                        max_iter=100)
    np.testing.assert_allclose(counts, want, rtol=1e-8, atol=1e-8)


def _slow_mixing_csr(rng, R=8000, T=400):
    """Clustered multimapping with near-equal weights: slow EM mixing."""
    sizes = rng.integers(2, 7, size=R)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    base = rng.integers(0, T - 8, size=R)
    txp_id = (
        np.repeat(base, sizes)
        + np.concatenate([np.arange(s) for s in sizes])
    ).astype(np.int32)
    w = np.exp(rng.normal(0, 0.05, A))
    read_id = np.repeat(np.arange(R, dtype=np.int32), sizes)
    return txp_id, w, boundaries, read_id, R, T


def test_squarem_same_fixed_point_fewer_steps():
    """SQUAREM reaches the same fixed point as plain EM (concave
    likelihood => unique) in fewer m-steps on slow-mixing data."""
    from oarfish_tpu.ops.em import run_em_squarem

    rng = np.random.default_rng(11)
    txp_id, w, boundaries, read_id, R, T = _slow_mixing_csr(rng)
    data = EmData.build(txp_id, w, read_id, R, T, dtype=jnp.float64)
    init = uniform_init(data, jnp.float64)

    c_em, n_em = run_em(data, init, 5000, 1e-8)
    c_sq, n_sq = run_em_squarem(data, init, 5000, 1e-8)
    c_em, c_sq = np.asarray(c_em), np.asarray(c_sq)
    # same total mass, same fixed point (the stopping rule bounds step
    # size, not distance to the optimum, so near-nonidentifiable
    # transcripts can sit at slightly different spots on a flat ridge —
    # tolerance is well under one read on a ~20 reads/transcript scale)
    assert abs(c_sq.sum() - c_em.sum()) < 1e-6 * R
    np.testing.assert_allclose(c_sq, c_em, rtol=5e-3, atol=0.05)
    # and materially fewer m-step applications
    assert int(n_sq) < int(n_em) // 2, (int(n_sq), int(n_em))
    # --max-em-iter is a HARD cap on m-step applications
    _, n_cap = run_em_squarem(data, init, 10, 1e-12, min_iters=0)
    assert int(n_cap) <= 10, int(n_cap)


def test_squarem_v4_batch_matches_single():
    """Batched (bootstrap) SQUAREM == per-replicate SQUAREM runs."""
    import jax

    from oarfish_tpu.ops.em_v4 import (
        EmV4Data,
        make_runner,
        run_em_v4_batch_squarem,
    )

    rng = np.random.default_rng(5)
    R, T = 12000, 600
    sizes = rng.geometric(1 / 3, size=R).clip(1, 12)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    txp_id = rng.integers(0, T, size=A).astype(np.int64)
    w = np.exp(rng.normal(0, 1, A))
    data, order = EmV4Data.build(txp_id, w, boundaries, T)
    init = jnp.full(T, R / T, dtype=jnp.float32)
    # multiplicities travel in the v4 read-layout row order
    mult = rng.poisson(1.0, size=(2, R)).astype(np.float32)[:, order]

    runner = make_runner(data, accel="squarem")
    singles = [
        np.asarray(
            runner(init, 120, 1e-3, multiplicity=jnp.asarray(m))[0]
        )
        for m in mult
    ]
    batch, niter = run_em_v4_batch_squarem(
        data, init, 120, 1e-3, jnp.asarray(mult)
    )
    batch = np.asarray(batch)
    for b in range(2):
        np.testing.assert_allclose(
            batch[b], singles[b], rtol=2e-4, atol=2e-3
        )
