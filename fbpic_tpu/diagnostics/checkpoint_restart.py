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


def write_checkpoint(sim, path):
    import h5py
    leaves, _ = _flatten_state(sim.state)
    with h5py.File(path, "w") as f:
        f.attrs["iteration"] = sim.iteration
        f.attrs["time"] = sim.time
        f.attrs["n_leaves"] = len(leaves)
        f.attrs["species_counts"] = np.asarray(sim._species_counts,
                                               dtype=np.int64)
        for i, leaf in enumerate(leaves):
            f.create_dataset("leaf_%05d" % i, data=np.asarray(leaf))


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

    leaves, treedef = _flatten_state(sim.state)
    with h5py.File(path, "r") as f:
        n = int(f.attrs["n_leaves"])
        if n != len(leaves):
            raise RuntimeError(
                "Checkpoint structure does not match the simulation "
                "(different species/fields configuration?)")
        new_leaves = []
        for i, leaf in enumerate(leaves):
            data = f["leaf_%05d" % i][...]
            new_leaves.append(jnp.asarray(data, dtype=leaf.dtype))
        counts = f.attrs["species_counts"]
    sim.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    sim._species_counts = [int(cnt) for cnt in counts]
