"""
fbpic_tpu: a TPU-native spectral quasi-3D Particle-In-Cell framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of FBPIC
(the Fourier-Bessel PIC code, see /root/reference): relativistic
particle-in-cell simulation for laser-wakefield and plasma-wakefield
acceleration, using a spectral (FFT in z, discrete Hankel transform in r)
field solver in cylindrical geometry with azimuthal mode decomposition.

Architecture (TPU-first, not a port):
  - One pytree `SimState` holds all fields + particles; one jit-compiled
    `step` function fuses the entire PIC cycle into a single XLA program.
  - Azimuthal modes are a leading batch axis ``(Nm, Nz, Nr)``; the Hankel
    transform is a batched dense matmul on the MXU; the z-FFT is XLA's
    native batched FFT.
  - Particle populations have static capacity with validity masks, so
    injection / removal / ionization stay shape-stable under jit.
  - Multi-chip runs shard the z axis over a 1-D `jax.sharding.Mesh` with
    guard-cell halo exchange over ICI.
"""

__version__ = "0.1.0"

from .fields.smoothing import BinomialSmoother

__all__ = ["BinomialSmoother", "__version__"]

# Top-level user API (populated as the framework is built out)
try:  # pragma: no cover
    from .core.simulation import Simulation  # noqa: F401
    __all__.append("Simulation")
except ImportError:
    pass
try:  # pragma: no cover
    from .lpa_utils.boosted_frame import BoostConverter  # noqa: F401
    __all__.append("BoostConverter")
except ImportError:
    pass
