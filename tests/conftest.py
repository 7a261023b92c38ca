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


# ---------------------------------------------------------------------------
# Smoke tier: one fast end-to-end case per subsystem (run: pytest -m smoke).
# Kept as a single list here so the tier stays auditable; target < 5 min
# total on one CPU core (VERDICT r2 item 10).
# ---------------------------------------------------------------------------
SMOKE = {
    ("test_core_math.py", "test_identity"),
    ("test_rotation_functions.py", "test_axis_angle_constant_rate"),
    ("test_mbs.py", "test_energy_conservation"),
    ("test_krylov.py", "test_cg_spd"),
    ("test_smc.py", "test_hertz"),
    ("test_contact.py", "test_rolling_friction_stops_rolling"),
    ("test_nsc_pencil.py", "test_sphere_rest_on_plane"),
    ("test_dem.py", "test_ballistic_single"),
    ("test_cell_dense.py", "test_roundtrip"),
    ("test_sph.py", "test_normalization"),
    ("test_fsi.py", "test_floating_equilibrium"),
    ("test_fea.py", "test_tip_load_deflection"),
    ("test_vehicle.py", "test_settles_level"),
    ("test_io_utils.py", "test_dem_roundtrip"),
    ("test_shafts.py", "test_gear_effective_inertia"),
    ("test_sensors.py", "test_imu_at_rest_reads_minus_gravity"),
    ("test_domains.py", "test_migration_moves_particle"),
    ("test_pallas_kernel.py", "test_parity_with_jnp"),  # sym interpret
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pt
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        tname = item.name.split("[")[0]
        if (fname, tname) in SMOKE:
            item.add_marker(_pt.mark.smoke)
