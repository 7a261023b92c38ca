"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
to expose 8 XLA CPU devices (mirrors how the driver's ``dryrun_multichip`` runs).

Note: this environment's sitecustomize registers a remote TPU backend and
force-sets ``jax_platforms`` via ``jax.config``, so the ``JAX_PLATFORMS`` env var
alone is NOT enough — we must override through ``jax.config`` after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests validate physics on CPU where fp64 is cheap; TPU runs use fp32 defaults.
jax.config.update("jax_enable_x64", False)
