"""Precision policy.

TPUs have no fast float64; physics-parity tests run on CPU with
``JAX_ENABLE_X64=1`` while TPU production runs use float32/complex64.
All device arrays derive their dtype from these two functions so a single
flag switches the whole framework.  Host-side *pre*-computation (Bessel
zeros, matrix inversion, PSATD coefficients) is always done in numpy
float64 and only cast on transfer, mirroring the reference's
double-precision setup path (/root/reference/fbpic/fields/psatd_coefs.py).
"""
import jax.numpy as jnp
from jax import config as _jax_config


def x64_enabled() -> bool:
    return bool(_jax_config.jax_enable_x64)


def real_dtype():
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64
