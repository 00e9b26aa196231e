"""Bootstrap inferential replicates, vmapped across the device.

The reference samples `n` read indices uniformly with replacement per
replicate and reruns the serial EM over that multiset
(`bootstrap.rs:7-16`, `em.rs:273-314`, rayon across replicates). Because
the M step is linear in read occurrences, a with-replacement index sample
is exactly a per-read multiplicity vector `c ~ Multinomial(R, 1/R)`; the
device EM takes that vector directly, and `vmap` runs all replicates as
one batched while_loop (each replicate frozen at its own convergence
point — see `run_em`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .em import EmData, run_em, run_em_squarem, uniform_init


def sample_multiplicities(
    rng: np.random.Generator, num_boot: int, num_reads: int
) -> np.ndarray:
    """[B, R] multinomial read multiplicities (≡ sorted with-replacement
    index samples of size R)."""
    return rng.multinomial(
        num_reads, np.full(num_reads, 1.0 / num_reads), size=num_boot
    ).astype(np.float64)


def bootstrap(
    data: EmData,
    num_boot: int,
    max_iter: int = 1000,
    convergence_thresh: float = 1e-3,
    init_abundances: Optional[np.ndarray] = None,
    dtype=jnp.float32,
    seed: int = 0,
    accel: str = "none",
) -> np.ndarray:
    """Run `num_boot` replicates; returns [B, T] f64 counts."""
    rng = np.random.default_rng(seed)
    mult = jnp.asarray(
        sample_multiplicities(rng, num_boot, data.num_reads), dtype=dtype
    )
    if init_abundances is not None:
        init = jnp.asarray(init_abundances, dtype=dtype)
    else:
        # per-replicate total weight: the multiset size is exactly R
        init = uniform_init(data, dtype)

    run_one = run_em_squarem if accel == "squarem" else run_em
    run = jax.vmap(
        lambda m: run_one(
            data, init, max_iter, convergence_thresh, multiplicity=m
        )[0]
    )
    counts = run(mult)
    return np.asarray(counts, dtype=np.float64)
