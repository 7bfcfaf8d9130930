"""Checkpoint / restart: save and reload the full simulation state.

TPU-native design: instead of reusing the openPMD field/particle
diagnostics and rebuilding state from them (reference:
/root/reference/fbpic/openpmd_diag/checkpoint_restart.py), the
checkpoint stores the complete SimState pytree (spectral + interp
fields as re/im arrays, all particle slots incl. dead ones and ring
cursors) -- restart is therefore bit-exact, not merely
physically-equivalent.  Files are plain HDF5 under `checkpoints/`.
"""
import os
import glob

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.complex_arr import CArr


class Checkpoint(object):
    """Periodic full-state checkpoint writer."""

    def __init__(self, period, checkpoint_dir="./checkpoints"):
        self.period = period
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)

    def write(self, sim):
        iteration = sim.iteration
        if iteration % self.period != 0 or iteration == 0:
            return
        write_checkpoint(sim, os.path.join(
            self.checkpoint_dir, "checkpoint_%08d.h5" % iteration))


def set_periodic_checkpoint(sim, period, checkpoint_dir="./checkpoints"):
    """Register periodic checkpoints of the full simulation state.

    Reference API: openpmd_diag/checkpoint_restart.py:22.
    """
    sim.checkpoints.append(Checkpoint(period, checkpoint_dir))


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def _named_leaves(state):
    """(keypath-name, leaf) pairs; names are stable across sessions."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def write_checkpoint(sim, path):
    import h5py
    named = _named_leaves(sim.state)
    with h5py.File(path, "w") as f:
        f.attrs["iteration"] = sim.iteration
        f.attrs["time"] = sim.time
        f.attrs["n_leaves"] = len(named)
        f.attrs["species_counts"] = np.asarray(sim._species_counts,
                                               dtype=np.int64)
        for i, (name, leaf) in enumerate(named):
            d = f.create_dataset("leaf_%05d" % i, data=np.asarray(leaf))
            d.attrs["keypath"] = name


def restart_from_checkpoint(sim, iteration=None,
                            checkpoint_dir="./checkpoints"):
    """Reload the latest (or specified) checkpoint into `sim`.

    Reference API: openpmd_diag/checkpoint_restart.py:77.
    """
    import h5py
    checkpoint_dir = os.path.abspath(checkpoint_dir)
    if iteration is None:
        files = sorted(glob.glob(
            os.path.join(checkpoint_dir, "checkpoint_*.h5")))
        if not files:
            raise RuntimeError(
                "No checkpoint found in %s" % checkpoint_dir)
        path = files[-1]
    else:
        path = os.path.join(checkpoint_dir,
                            "checkpoint_%08d.h5" % iteration)

    import dataclasses
    with h5py.File(path, "r") as f:
        by_name = {}
        for key in f:
            d = f[key]
            name = d.attrs.get("keypath")
            by_name[name if name is not None else key] = d[...]
        counts = f.attrs["species_counts"]

    state = sim.state
    if any(k is None or k.startswith("leaf_") for k in by_name):
        # Old (index-only) checkpoint format: positional restore
        leaves, treedef = _flatten_state(state)
        if len(by_name) != len(leaves):
            raise RuntimeError(
                "Checkpoint structure does not match the simulation "
                "(different species/fields configuration?)")
        new_leaves = [jnp.asarray(by_name["leaf_%05d" % i],
                                  dtype=leaf.dtype)
                      for i, leaf in enumerate(leaves)]
        sim.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        sim._species_counts = [int(cnt) for cnt in counts]
        return

    # Materialize optional per-particle fields that exist in the file
    # but not (yet) in this simulation -- e.g. tracking ids when the
    # restart branch of an input script skips `elec.track()`
    # (reference restarts rebuild species from the checkpoint too).
    species = list(state.species)
    for i, sp in enumerate(species):
        updates = {}
        for field in ("ids", "ids_hi", "next_id", "next_id_hi",
                      "ionization_level", "next_free", "inj_z_end",
                      "comp_x", "comp_y", "comp_z"):
            key = ".species[%d].%s" % (i, field)
            if getattr(sp, field) is None and key in by_name:
                updates[field] = jnp.asarray(by_name[key])
        if updates:
            species[i] = dataclasses.replace(sp, **updates)
    state = dataclasses.replace(state, species=tuple(species))

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    new_leaves = []
    for path_, leaf in flat:
        name = jax.tree_util.keystr(path_)
        if name not in by_name:
            raise RuntimeError(
                "Checkpoint is missing %r -- the simulation has state "
                "the checkpoint run did not (e.g. track() or "
                "make_ionizable() called only in the restart branch). "
                "Configure the species identically before restarting."
                % name)
        new_leaves.append(jnp.asarray(by_name[name], dtype=leaf.dtype))
    sim.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    sim._species_counts = [int(cnt) for cnt in counts]
