"""Particle state: fixed-capacity SoA pytree with validity-by-weight.

TPU/XLA requires static shapes: particle arrays are allocated with a
fixed capacity and unused slots carry ``w = 0`` (they deposit nothing and
their push is harmless).  Injection / removal / ionization write into
free slots instead of reallocating -- the one deep structural change vs
the reference (/root/reference/fbpic/particles/particles.py), which
reallocates numpy arrays dynamically.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_dataclass
from ..utils.dtypes import real_dtype


@static_dataclass
class SpeciesConfig:
    """Static per-species data (hashable; part of the jit closure)."""
    q: float                  # charge [C] (elementary charge for ionizable)
    m: float                  # mass [kg]
    particle_shape: str = "linear"   # 'linear' or 'cubic'
    is_tracer: bool = False
    ionizable: bool = False
    name: str = "species"
    # Ballistic-before-plane injection (None = normal push); the plane
    # is at z = ballistic_z0 + ballistic_v * t
    ballistic_z0: object = None
    ballistic_v: float = 0.0
    # ADK ionization settings (an IonizerConfig, or None)
    ionizer: object = None
    # Compton scattering settings (a ComptonConfig, or None)
    compton: object = None
    # Sorted dense deposition: static per-column slot capacity K
    # (0 = use the scatter deposition path).  See sorted_deposit.py.
    sort_K: int = 0
    # Resident column-padded layout (capacity == Nz * sort_K; the step
    # sorts once at its start and keeps the species in padded form all
    # step -- field gather becomes an MXU contraction).  Set by
    # Simulation when it sizes the capacity; see step._resident_indices.
    resident: bool = False
    # Re-sort strategy for resident species.  "full": rebuild the flat
    # column sort every step (build_column_sort payload path).
    # "banded": per-step banded re-sort of the stored (Nz, K) rows
    # (positions move <= band columns per step; one batched row-wise
    # sort over the 2*band+1 neighbor rows' slots -- ~10x cheaper than
    # the flat sort, sorted_deposit.banded_column_resort), with a full
    # flat sort on the steps whose exchange/injection block rewrites
    # the storage order.  Simulation picks "banded" when the per-step
    # band is small (FBPIC_TPU_RESORT=full opts out).
    resort: str = "full"


@pytree_dataclass
class ParticleState:
    """SoA particle arrays of a single species, shape (capacity,)."""
    x: jax.Array
    y: jax.Array
    z: jax.Array
    ux: jax.Array
    uy: jax.Array
    uz: jax.Array
    inv_gamma: jax.Array
    w: jax.Array               # macroparticle weight; 0 marks a dead slot
    ionization_level: Optional[jax.Array] = None  # uint8, ionizable species
    # Tracking ids as two uint32 words (the TPU has no uint64; the
    # diagnostics reassemble hi << 32 | lo, matching the reference's
    # uint64 ids, tracking.py)
    ids: Optional[jax.Array] = None               # uint32 low word
    ids_hi: Optional[jax.Array] = None            # uint32 high word
    # Continuous-injection bookkeeping (None unless injecting):
    next_free: Optional[jax.Array] = None   # int32 ring-buffer cursor
    inj_z_end: Optional[jax.Array] = None   # scalar: end of loaded plasma
    # Tracking id counter (None unless ids are tracked)
    next_id: Optional[jax.Array] = None     # uint32 scalar (low word)
    next_id_hi: Optional[jax.Array] = None  # uint32 scalar (high word)
    # Kahan compensation of the position accumulators (float32 runs
    # only): per-step wake/ponderomotive displacements (~5e-14 m) are
    # far below the f32 ULP of the positions (~2e-12 m at z ~ 40 um)
    # and would be rounded away systematically; the compensation words
    # carry the lost low bits (SURVEY hard part 3).
    comp_x: Optional[jax.Array] = None
    comp_y: Optional[jax.Array] = None
    comp_z: Optional[jax.Array] = None

    @property
    def capacity(self):
        return self.x.shape[0]


def _round_capacity(n, multiple=256):
    return max(multiple, int(-(-n // multiple) * multiple))


def pad_particle_state(sp: ParticleState, new_cap: int,
                       row_shape=None) -> ParticleState:
    """Grow every per-particle array to ``new_cap`` with dead slots.

    row_shape=(Nz, K_old): pad each of the Nz rows of the stored
    column-padded layout to the new per-row capacity instead of
    appending at the array end (required when the species uses the
    lazy re-sort, whose between-sort layout is positional).

    Used when a resident species' sort_K is auto-bumped: residency
    requires capacity == Nz * sort_K (step._resident_indices), so the
    bump must reallocate — the analog of the reference's unbounded
    array growth (/root/reference/fbpic/particles/elementary_process/
    cuda_numba_utils.py:60-120).  New slots are dead (w = 0,
    inv_gamma = 1) and are harmless through push/deposit.
    """
    import dataclasses
    old = sp.capacity
    if new_cap < old:
        raise ValueError(f"cannot shrink capacity {old} -> {new_cap}")
    if new_cap == old:
        return sp
    if row_shape is not None:
        # Row-aware repad: the stored order IS a (Nz, K_old) layout
        # (lazy re-sort keeps it between sorts), so the new dead slots
        # must go at the tail of EVERY row, not at the array end.
        Nz_rows, K_old = row_shape
        assert Nz_rows * K_old == old and new_cap % Nz_rows == 0
        K_new = new_cap // Nz_rows
    updates = {}
    for name in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w",
                 "ionization_level", "ids", "ids_hi",
                 "comp_x", "comp_y", "comp_z"):
        arr = getattr(sp, name)
        if arr is None:
            continue
        fill = 1.0 if name == "inv_gamma" else 0.0
        if row_shape is not None:
            pad = jnp.full((Nz_rows, K_new - K_old), fill,
                           dtype=arr.dtype)
            updates[name] = jnp.concatenate(
                [arr.reshape(Nz_rows, K_old), pad], axis=1).reshape(-1)
            continue
        pad = jnp.full((new_cap - old,), fill, dtype=arr.dtype)
        updates[name] = jnp.concatenate([arr, pad])
    return dataclasses.replace(sp, **updates)


def make_particle_state(
    x, y, z, ux, uy, uz, inv_gamma, w,
    capacity=None, ionization_level=None, ids=None, dtype=None,
) -> ParticleState:
    """Pack numpy arrays into a padded, fixed-capacity ParticleState."""
    dtype = dtype or real_dtype()
    n = len(x)
    cap = capacity if capacity is not None else _round_capacity(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < number of particles {n}")

    def pad(a, fill=0.0, dt=dtype):
        out = np.full(cap, fill, dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out, dtype=dt)

    extra = {}
    if dtype == np.float32 or dtype == jnp.float32:
        extra.update(comp_x=jnp.zeros(cap, jnp.float32),
                     comp_y=jnp.zeros(cap, jnp.float32),
                     comp_z=jnp.zeros(cap, jnp.float32))
    if ionization_level is not None:
        lev = np.zeros(cap, dtype=np.uint8)
        lev[:n] = ionization_level
        extra["ionization_level"] = jnp.asarray(lev)
    if ids is not None:
        idarr = np.zeros(cap, dtype=np.uint64)
        idarr[:n] = ids
        extra["ids"] = jnp.asarray(idarr)

    return ParticleState(
        x=pad(x), y=pad(y), z=pad(z),
        ux=pad(ux), uy=pad(uy), uz=pad(uz),
        inv_gamma=pad(inv_gamma, fill=1.0),
        w=pad(w, fill=0.0),
        next_free=jnp.asarray(n, dtype=jnp.int32),
        **extra,
    )


def unalign_angles(thetap, Npz, Npr, method="random", rng=None):
    """Shift angles so particles are not aligned along radial 'star arms'.

    Same shift for all Nptheta particles at one (z, r) position, which
    preserves initially-zero azimuthal modes.  Reference:
    /root/reference/fbpic/particles/injection/continuous_injection.py:275.
    """
    if method == "random":
        rng = rng or np.random
        angle_shift = 2 * np.pi * rng.random_sample((Npz, Npr))
    elif method == "irrational":
        # Golden-ratio increments: deterministic, low-discrepancy
        i = np.arange(Npz * Npr).reshape(Npz, Npr)
        angle_shift = 2 * np.pi * ((1 + np.sqrt(5)) / 2 * i % 1)
    else:
        raise ValueError(method)
    thetap += angle_shift[:, :, np.newaxis]


def _check_dens_func_arguments(dens_func):
    import inspect
    params = list(inspect.signature(dens_func).parameters.keys())
    if params[:3] == ["x", "y", "z"]:
        return ["x", "y", "z"]
    return ["z", "r"]


def generate_evenly_spaced(
    Npz, zmin, zmax, Npr, rmin, rmax, Nptheta, n, dens_func,
    ux_m=0.0, uy_m=0.0, uz_m=0.0, ux_th=0.0, uy_th=0.0, uz_th=0.0,
    rng=None,
):
    """Evenly-spaced particle loading on a z*r*theta lattice (host, numpy).

    Weights are density * cell volume (r dtheta dr dz), modulated by
    dens_func.  Reference: continuous_injection.py:203-270.
    """
    rng = rng or np.random
    if Npz * Npr * Nptheta > 0:
        dz = (zmax - zmin) * 1.0 / Npz
        z_reg = zmin + dz * (np.arange(Npz) + 0.5)
        dr = (rmax - rmin) * 1.0 / Npr
        r_reg = rmin + dr * (np.arange(Npr) + 0.5)
        dtheta = 2 * np.pi / Nptheta
        theta_reg = dtheta * np.arange(Nptheta)

        zp, rp, thetap = np.meshgrid(z_reg, r_reg, theta_reg,
                                     copy=True, indexing="ij")
        unalign_angles(thetap, Npz, Npr, method="random", rng=rng)
        r = rp.flatten()
        x = r * np.cos(thetap.flatten())
        y = r * np.sin(thetap.flatten())
        z = zp.flatten()
        w = n * r * dtheta * dr * dz
        if dens_func is not None:
            args = _check_dens_func_arguments(dens_func)
            if args == ["x", "y", "z"]:
                w = w * dens_func(x=x, y=y, z=z)
            else:
                w = w * dens_func(z=z, r=r)

        selected = w > 0
        Ntot = int(selected.sum())
        x, y, z, w = x[selected], y[selected], z[selected], w[selected]
        ux = ux_m * np.ones(Ntot) + ux_th * rng.normal(size=Ntot)
        uy = uy_m * np.ones(Ntot) + uy_th * rng.normal(size=Ntot)
        uz = uz_m * np.ones(Ntot) + uz_th * rng.normal(size=Ntot)
        inv_gamma = 1.0 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
        return Ntot, x, y, z, ux, uy, uz, inv_gamma, w
    else:
        e = np.empty(0)
        return 0, e, e, e, e, e, e, e, e
