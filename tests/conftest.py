"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Physics-parity tests need double precision; TPU production runs use
float32 (covered by the benchmark and by dedicated f32 smoke tests).
"""
import os

# Force CPU for the physics-parity suite (the environment may preset a
# TPU platform); set FBPIC_TPU_TEST_ON_TPU=1 to run tests on the chip.
if not os.environ.get("FBPIC_TPU_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402  (import after env setup)

# The environment may pre-register a TPU plugin that ignores the env var;
# the config update takes precedence as long as no backend is initialized.
if not os.environ.get("FBPIC_TPU_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------
# Quick tier: `python -m pytest -m quick` finishes in minutes (the full
# suite is ~1 h single-threaded) -- run it on every change; the full
# suite before committing milestone work.  Files listed here are
# whole-file fast; individual tests elsewhere can add @pytest.mark.quick.
_QUICK_FILES = {
    "test_spectral_core.py", "test_particles.py", "test_uniform_rho.py",
    "test_charge_cylinder.py", "test_moving_window.py",
    "test_rho_prev_reuse.py", "test_migration_regression.py",
    "test_pallas_deposit.py", "test_pallas_gather.py",
    "test_diagnostics.py", "test_resident_processes.py",
    "test_external_fields.py", "test_blowout_overflow.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if os.path.basename(str(item.fspath)) in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
