"""Particle tracking: unique ids per macroparticle.

TPU-native: ids are stored as TWO uint32 device arrays (low/high
word; the TPU has no uint64) and reassembled to 64-bit integers in the
diagnostics, so they never wrap in practice (the reference uses plain
uint64, particles/tracking/tracking.py).  New ids for injected /
ionized / scattered particles are assigned inside the jit step from a
per-species running two-word counter.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp


def enable_tracking(sim, view):
    """Assign unique ids to the (live) particles of a species and
    enable id propagation for injected particles.

    Reference API: Particles.track(comm) -> here sim.track(view) or
    view.track().
    """
    idx = view._index
    sp = sim.state.species[idx]
    cap = sp.capacity
    ids = np.zeros(cap, dtype=np.uint32)
    n = view.Ntot
    ids[:n] = np.arange(1, n + 1, dtype=np.uint32)
    sp = dataclasses.replace(
        sp, ids=jnp.asarray(ids),
        ids_hi=jnp.zeros(cap, dtype=jnp.uint32),
        next_id=jnp.asarray(n + 1, dtype=jnp.uint32),
        next_id_hi=jnp.asarray(0, dtype=jnp.uint32))
    species = list(sim.state.species)
    species[idx] = sp
    sim.state = dataclasses.replace(sim.state, species=tuple(species))
    sim._step_fns.clear()
