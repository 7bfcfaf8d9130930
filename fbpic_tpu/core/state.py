"""The one simulation state pytree that flows through the jit step."""
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..fields.solver import SpectralFields, InterpFields
from ..particles.state import ParticleState


@pytree_dataclass
class SimState:
    """Full simulation state: fields + particles + scalars.

    The reference spreads this over Fields / Particles / Simulation
    attributes (/root/reference/fbpic/main.py:332-341); here it is a
    single immutable pytree so the whole PIC cycle is one XLA program.
    """
    spect: SpectralFields
    interp: InterpFields
    species: Tuple[ParticleState, ...]
    time: jax.Array        # scalar, simulation time [s]
    zmin: jax.Array        # scalar, left edge of the local grid [m]
    iteration: jax.Array   # int32 scalar
    # Continuous moving-window reference position (None = no window)
    mw_zref: jax.Array = None
    # Root seed for device-side randomness (injection, ionization,
    # Compton draws); uint32 scalar.  None falls back to stream 0 --
    # kept optional for states built by external code.
    seed: jax.Array = None
    # Multi-chip: running count of particles LOST because a migration
    # buffer overflowed (int32 scalar, psum'd across devices; None on
    # single-device runs).  Simulation surfaces a warning when > 0.
    migration_overflow: jax.Array = None
    # Running count of particle-steps whose z column exceeded the
    # sorted-deposit capacity sort_K (their charge is dropped by the
    # dense deposition).  Computed IN-JIT from the sort histogram every
    # step; Simulation checks it after every step() call and auto-bumps
    # sort_K (one recompile) -- no silent loss (reference has no analog:
    # its GPU sort reallocates).  int32 scalar; None until first step.
    sort_overflow: jax.Array = None
    # Running count of live in-range particles that continuous
    # injection overwrote (ring buffer full; trapped charge that
    # outlived one box crossing).  int32 scalar; None until first step.
    ring_overwrite: jax.Array = None
