"""Device-mesh helpers and sharding layouts.

Two levels of parallelism (SURVEY.md section 2.4 / 5):
  - Particle data parallelism ('p' axis): particle arrays are sharded
    over devices, grids are replicated; XLA inserts the psum over the
    deposited sources automatically.  The particle kernels (gather,
    push, deposit weights) dominate PIC cost, so this is the first
    useful scaling axis and composes with any grid size.
  - z-domain decomposition (later): slab decomposition with guard-cell
    halo exchange over ICI (ppermute), the analog of the reference's
    MPI decomposition (boundary_communicator.py).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import SimState


def make_mesh(n_devices=None, axis_name="p", devices=None):
    """Create a 1-D device mesh.

    Asking for more devices than exist is an error -- silently
    truncating would turn a multi-device parity test into a 1-device
    no-op (the axon TPU plugin ignores os.environ['JAX_PLATFORMS']
    set at runtime, so a CPU-mesh script that forgets
    jax.config.update('jax_platforms', 'cpu') sees ONE TPU device).
    """
    if devices is None:
        avail = jax.devices()
        if n_devices is not None and n_devices > len(avail):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(avail)} device(s) are available "
                f"({[str(d) for d in avail[:2]]}...); for a virtual "
                f"CPU mesh set XLA_FLAGS=--xla_force_host_platform_"
                f"device_count=N and jax.config.update("
                f"'jax_platforms', 'cpu') before first use")
        devices = avail[: n_devices or len(avail)]
    return Mesh(np.array(devices), (axis_name,))


def particle_dp_shardings(mesh, state: SimState, axis_name="p"):
    """Shardings for particle data parallelism: particles sharded along
    their (capacity,) axis, fields and scalars replicated."""
    replicated = NamedSharding(mesh, P())
    sharded_1d = NamedSharding(mesh, P(axis_name))

    def shard_leaf(path, leaf):
        # Particle arrays are 1-D (capacity,); everything else replicated
        names = [getattr(p, "name", str(p)) for p in path]
        if "species" in names and hasattr(leaf, "ndim") and leaf.ndim == 1:
            return sharded_1d
        return replicated

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    shardings = [shard_leaf(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)
