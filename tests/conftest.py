"""Test harness setup: run JAX on a virtual 8-device CPU mesh with x64 so
the f64 parity path is exact, per SURVEY §4 (multi-chip sharding is
validated without TPU hardware via xla_force_host_platform_device_count).

The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and
the axon plugin re-asserts itself over the env var, so the platform must be
forced to cpu through jax.config, before any backend initialization.
"""

import os

# the persistent v4 plan cache would short-circuit rebuild-twice
# differential tests (and write to ~/.cache from CI); the dedicated
# cache tests opt back in with a tmp dir
os.environ.setdefault("OARFISH_PLAN_CACHE", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
