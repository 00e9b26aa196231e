"""Multi-host pod-slice execution: distributed init + global CSR assembly.

The reference is strictly single-process (SURVEY §2: no collectives of any
kind); this module is new design per the north star: each host packs its
own shard of the reads (its BAM chunk), the shards are assembled into one
global device array over a `data` mesh spanning all hosts' devices, and
`sharded_em` runs with one `psum` of partial transcript counts per EM
iteration — riding ICI within a slice and DCN across hosts.

On a single host this degrades to the tested N-device path; the global
assembly (`make_array_from_single_device_arrays`) is identical in both
cases, so the multi-host construction is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded_em import ShardedCsr, make_sharded_em

log = logging.getLogger("oarfish_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def global_data_mesh(devices=None) -> Mesh:
    """1-D `data` mesh over all (global) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def assemble_global_shards(
    mesh: Mesh, per_device_arrays: Sequence[np.ndarray], dtype
) -> jax.Array:
    """Build a global array sharded over `data` from one equal-shaped host
    shard per local device (`jax.make_array_from_single_device_arrays`).
    In multi-host runs every process calls this with its own local
    devices' shards; the result is a global view."""
    local_devices = [d for d in mesh.devices.flat if d.process_index ==
                     jax.process_index()]
    assert len(per_device_arrays) == len(local_devices)
    shard_shape = per_device_arrays[0].shape
    global_shape = (len(list(mesh.devices.flat)) * shard_shape[0],) + tuple(
        shard_shape[1:]
    )
    sharding = NamedSharding(mesh, P("data", *([None] * (len(shard_shape) - 1))))
    singles = [
        jax.device_put(np.asarray(a, dtype=dtype), d)
        for a, d in zip(per_device_arrays, local_devices)
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, singles
    )


def sharded_em_global(
    txp_id: np.ndarray,
    weights: np.ndarray,
    boundaries: np.ndarray,
    num_txps: int,
    init: np.ndarray,
    max_iter: int = 1000,
    convergence_thresh: float = 1e-3,
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, int]:
    """Data-parallel EM where the CSR shards are placed per device through
    the global-assembly path (multi-host capable; on one host this equals
    `sharded_em` but exercises the same construction a pod run uses)."""
    if mesh is None:
        mesh = global_data_mesh()
    D = len(list(mesh.devices.flat))
    sh = ShardedCsr(txp_id, weights, boundaries, num_txps, D)
    run = make_sharded_em(mesh, num_txps, sh.r_pad, max_iter)

    # only THIS process's devices are addressable in a multi-process run:
    # place the mesh positions owned by local devices (every process
    # computes the full shard set from the same CSR; the global array is
    # assembled from each process's local pieces)
    local_pos = [
        i
        for i, d in enumerate(mesh.devices.flat)
        if d.process_index == jax.process_index()
    ]

    def shard_rows(arr, dt):
        return assemble_global_shards(
            mesh, [arr[p : p + 1] for p in local_pos], dt
        )

    init_p = jnp.concatenate(
        [jnp.asarray(init, dtype=dtype), jnp.zeros(1, dtype=dtype)]
    )
    counts, niter = run(
        shard_rows(sh.txp_id, jnp.int32),
        shard_rows(sh.weights, dtype),
        shard_rows(sh.read_id, jnp.int32),
        shard_rows(sh.txp_sort_perm, jnp.int32),
        shard_rows(sh.txp_id_sorted, jnp.int32),
        init_p,
        jnp.asarray(convergence_thresh, dtype=dtype),
    )
    return np.asarray(counts, dtype=np.float64)[:num_txps], int(niter)
