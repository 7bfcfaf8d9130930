"""Interpolation-grid <-> spectral-grid transforms, batched over modes.

All fields are stored stacked over azimuthal modes: complex (Nm, Nz, Nr).
The z transform is XLA's batched FFT; the radial transform is a dense
per-mode matmul executed on the MXU.  Complex x real matmuls are done by
splitting real/imag parts (two real GEMMs), which is the MXU-optimal
version of the reference's "stack 2Nz reals" trick
(/root/reference/fbpic/fields/spectral_transform/hankel.py:129-157).

Transform composition (reference: spectral_transformer.py:89-223):
  scalar  interp->spect : FFT(z) then  G = F @ M0
  scalar  spect->interp : F = G @ invM0  then IFFT(z)
  vector  interp->spect : FFT both, (r,t)->(p,m), p @ Mp, m @ Mm
  vector  spect->interp : p @ invMp, m @ invMm, (p,m)->(r,t), IFFT both
"""
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..utils.dtypes import real_dtype, complex_dtype
from .hankel import build_mode_matrices


@pytree_dataclass
class TransformMatrices:
    """Device-resident DHT matrices, stacked over modes: (Nm, Nr, Nr)."""
    M0: jax.Array
    invM0: jax.Array
    Mp: jax.Array
    invMp: jax.Array
    Mm: jax.Array
    invMm: jax.Array
    kr: jax.Array  # (Nm, Nr)

    @staticmethod
    def build(Nm: int, Nr: int, rmax: float, dtype=None) -> "TransformMatrices":
        mats = build_mode_matrices(Nm, Nr, rmax)
        dtype = dtype or real_dtype()
        return TransformMatrices(
            **{k: jnp.asarray(v, dtype=dtype) for k, v in mats.items()}
        )


def dht(M: jax.Array, F: jax.Array) -> jax.Array:
    """Batched radial transform: out[m, z, s] = sum_r F[m, z, r] M[m, r, s].

    M is real (Nm, Nr, Nr); F is complex (Nm, Nz, Nr).  Split into two
    real matmuls so the MXU does not waste flops on a zero imaginary
    part of M.
    """
    Fr = jnp.einsum("mzr,mrs->mzs", F.real, M, preferred_element_type=M.dtype)
    Fi = jnp.einsum("mzr,mrs->mzs", F.imag, M, preferred_element_type=M.dtype)
    return jax.lax.complex(Fr, Fi)


def fft_z(F: jax.Array) -> jax.Array:
    """Forward FFT along z (axis -2), unnormalized (numpy convention)."""
    return jnp.fft.fft(F, axis=-2)


def ifft_z(F: jax.Array) -> jax.Array:
    """Inverse FFT along z (axis -2), 1/Nz normalized."""
    return jnp.fft.ifft(F, axis=-2)


def rt_to_pm(Fr: jax.Array, Ft: jax.Array):
    """(r, t) -> (+, -) spectral combination."""
    Fp = 0.5 * (Fr - 1.0j * Ft)
    Fm = 0.5 * (Fr + 1.0j * Ft)
    return Fp, Fm


def pm_to_rt(Fp: jax.Array, Fm: jax.Array):
    """(+, -) -> (r, t) combination."""
    Fr = Fp + Fm
    Ft = 1.0j * (Fp - Fm)
    return Fr, Ft


def interp2spect_scal(mats: TransformMatrices, F: jax.Array) -> jax.Array:
    return dht(mats.M0, fft_z(F))


def spect2interp_scal(mats: TransformMatrices, G: jax.Array) -> jax.Array:
    return ifft_z(dht(mats.invM0, G))


def interp2spect_vect(mats: TransformMatrices, Fr, Ft):
    fr = fft_z(Fr)
    ft = fft_z(Ft)
    p, m = rt_to_pm(fr, ft)
    return dht(mats.Mp, p), dht(mats.Mm, m)


def spect2interp_vect(mats: TransformMatrices, Gp, Gm):
    p = dht(mats.invMp, Gp)
    m = dht(mats.invMm, Gm)
    Fr, Ft = pm_to_rt(p, m)
    return ifft_z(Fr), ifft_z(Ft)
