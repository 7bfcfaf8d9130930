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
