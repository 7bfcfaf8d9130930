"""User-facing multi-chip distribution: Simulation -> sharded stepper.

``distribute_simulation(sim)`` takes a fully configured single-chip
:class:`~fbpic_tpu.Simulation` (species, lasers, moving window, ...)
and decomposes it over a 1-D z mesh of the available devices -- the
TPU analog of launching the reference with ``mpirun -np N``
(reference: boundary_communicator.py; parallelisation docs).

Design: the returned :class:`DistributedRun` owns a sharded SimState
(fields (Nm, ndev*Nzl, Nr) with the z axis sharded, particle arrays
(ndev*cap,) sharded) and a shard_map'd N-step function.  Guard
exchange / migration / global-edge handling live in
:mod:`fbpic_tpu.parallel.domain`.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields.solver import build_field_aux
from ..fields import transform as tr
from ..utils.complex_arr import CArr
from ..particles.state import ParticleState
from ..core.state import SimState
from .mesh import make_mesh
from . import domain as dom


def _round256(n):
    return max(256, int(-(-int(n) // 256) * 256))


class DistributedRun:
    """A z-decomposed simulation run over a device mesh.

    Usage::

        run = distribute_simulation(sim)   # after full setup
        run.step(100)
        Ez = run.get_interp_field("Ez", m=0)   # global physical grid
    """

    def __init__(self, sim, n_devices=None, axis_name="z",
                 migration_buffer=None, n_guard=None,
                 on_migration_overflow="error", **step_kwargs):
        if on_migration_overflow not in ("error", "warn"):
            raise ValueError(
                "on_migration_overflow must be 'error' or 'warn'")
        self.on_migration_overflow = on_migration_overflow
        self.sim = sim
        config = sim.config
        mesh = make_mesh(n_devices, axis_name=axis_name)
        ndev = int(mesh.devices.size)
        if config.Nz % ndev != 0:
            raise ValueError(
                f"The internal grid Nz={config.Nz} must be divisible by "
                f"the number of devices ({ndev}).  Adjust Nz (physical "
                f"Nz + edge cells) or the device count.")
        self.mesh = mesh
        self.axis_name = axis_name
        self.ndev = ndev

        options = sim.build_options(**step_kwargs)
        if migration_buffer is None:
            # Sized for ~2 columns' worth of particles crossing per
            # exchange (window at c moves 1 column/step; exchanges are
            # every step in the decomposed step)
            occ = max((sc.sort_K for sc in sim.species_configs),
                      default=0)
            migration_buffer = max(2048, 2 * occ)
        self.multi_step, self.config_local = dom.make_multichip_step(
            config, tuple(sim.species_configs), options, mesh,
            axis_name=axis_name, migration_buffer=migration_buffer,
            n_guard=n_guard)
        self.aux = build_field_aux(self.config_local, sim.smoother)
        self.g = self.config_local.n_guard
        self.Nz_int = self.config_local.Nz - 2 * self.g

        self.state = self._shard_state(sim.state)
        self._jit_step = jax.jit(self.multi_step, static_argnums=2,
                                 donate_argnums=0)
        self.iteration = int(sim.iteration)

    # -- state conversion -------------------------------------------------

    def _reslice_spect(self, F, mats_global):
        """Global single-chip spectral CArr -> concat of per-slab
        spectral CArr.

        The radial Hankel basis is IDENTICAL for the local and global
        boxes (r is not decomposed), so the basis change is done in
        PARTIAL space: inverse z-DFT with the global matrices, slab
        slicing, forward z-DFT with the local matrices.  (Going
        through the full interpolation grid would need per-component
        Hankel orders -- Ep/Em live in the m+-1 bases.)"""
        (partial,) = tr.ifft_z_many(mats_global, [F])
        return self._reslice_z(partial, to_spect=True)

    def _reslice_interp(self, F):
        """Global interp CArr (Nm, Nz, Nr) -> per-slab concat."""
        return self._reslice_z(F, to_spect=False)

    def _reslice_z(self, F, to_spect):
        """Slice a z-real-space CArr into extended slabs (halo cells
        filled from neighboring data; zeros beyond the global edges for
        open z, periodic wrap otherwise)."""
        config = self.sim.config
        Nz = config.Nz
        re = np.asarray(F.re)
        im = np.asarray(F.im)
        slabs_re, slabs_im = [], []
        periodic = config.boundaries_z == "periodic"
        for i in range(self.ndev):
            idx = np.arange(self.config_local.Nz) + i * self.Nz_int - self.g
            if periodic:
                idx = idx % Nz
                sl_re, sl_im = re[:, idx, :], im[:, idx, :]
            else:
                valid = (idx >= 0) & (idx < Nz)
                idxc = np.clip(idx, 0, Nz - 1)
                sl_re = np.where(valid[None, :, None], re[:, idxc, :], 0.0)
                sl_im = np.where(valid[None, :, None], im[:, idxc, :], 0.0)
            slab = CArr(jnp.asarray(sl_re), jnp.asarray(sl_im))
            if to_spect:
                (slab,) = tr.fft_z_many(self.aux.mats, [slab])
            slabs_re.append(np.asarray(slab.re))
            slabs_im.append(np.asarray(slab.im))
        return CArr(jnp.asarray(np.concatenate(slabs_re, axis=1)),
                    jnp.asarray(np.concatenate(slabs_im, axis=1)))

    def _shard_state(self, state):
        sim = self.sim
        cfgl = self.config_local
        mats_g = sim.aux.mats

        # Fields: every spectral component through the global->local
        # basis change; interp grid rebuilt from the spectral fields.
        spect_fields = {}
        for f in dataclasses.fields(state.spect):
            val = getattr(state.spect, f.name)
            if val is None:
                spect_fields[f.name] = None
            else:
                spect_fields[f.name] = self._reslice_spect(val, mats_g)
        spect = type(state.spect)(**spect_fields)

        interp_fields = {}
        for f in dataclasses.fields(state.interp):
            val = getattr(state.interp, f.name)
            if val is None:
                interp_fields[f.name] = None
            else:
                interp_fields[f.name] = self._reslice_interp(val)
        interp = type(state.interp)(**interp_fields)

        # Particles: bin into slabs by z, pack per-rank blocks.
        species = []
        zmin_g = float(state.zmin)
        Lz_int = self.Nz_int * cfgl.dz
        for sp in state.species:
            arrays = {f.name: getattr(sp, f.name)
                      for f in dataclasses.fields(sp)}
            z = np.asarray(arrays["z"])
            w = np.asarray(arrays["w"])
            dev = np.clip(((z - zmin_g) // Lz_int).astype(int),
                          0, self.ndev - 1)
            dev = np.where(w != 0, dev, -1)
            max_count = max((int((dev == i).sum())
                             for i in range(self.ndev)), default=0)
            cap = _round256(max(1.5 * max_count,
                                1.2 * sp.capacity / self.ndev))
            blocks = {}
            for name, arr in arrays.items():
                if arr is None:
                    blocks[name] = None
                    continue
                arr_np = np.asarray(arr)
                if arr_np.ndim == 0:
                    blocks[name] = jnp.asarray(arr_np)   # replicated
                    continue
                out = np.zeros(self.ndev * cap, arr_np.dtype)
                if name == "inv_gamma":
                    out[:] = 1.0
                for i in range(self.ndev):
                    sel = dev == i
                    cnt = int(sel.sum())
                    out[i * cap:i * cap + cnt] = arr_np[sel]
                blocks[name] = jnp.asarray(out)
            if blocks.get("next_free") is not None:
                # The ring cursor is replicated but only the LAST rank
                # writes injected particles: point it at the first free
                # slot of the last rank's block.
                cnt_last = int((dev == self.ndev - 1).sum())
                blocks["next_free"] = jnp.asarray(cnt_last, jnp.int32)
            species.append(ParticleState(**blocks))

        state = SimState(
            spect=spect, interp=interp, species=tuple(species),
            time=state.time, zmin=state.zmin,
            iteration=state.iteration, mw_zref=state.mw_zref,
            seed=state.seed,
            migration_overflow=jnp.zeros((), jnp.int32),
        )
        # Physically shard over the mesh
        specs = self._state_specs(state)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs)
        return jax.device_put(state, shardings)

    def _state_specs(self, state):
        ax = self.axis_name

        def spec_leaf(path, leaf):
            names = [getattr(p, "name", "") for p in path]
            if "species" in names:
                return P(ax) if leaf.ndim == 1 else P()
            if ("spect" in names or "interp" in names) and leaf.ndim == 3:
                return P(None, ax, None)
            return P()
        flat, treedef = jax.tree_util.tree_flatten_with_path(state)
        return jax.tree_util.tree_unflatten(
            treedef, [spec_leaf(p, l) for p, l in flat])

    # -- running ----------------------------------------------------------

    def step(self, N=1):
        """Advance the decomposed simulation N steps."""
        sim = self.sim
        inj_auxes = (tuple(sim._injector_auxes)
                     if sim.moving_win is not None else ())
        ion_auxes = tuple(sim._ionizer_auxes)
        comp_auxes = tuple(sim._compton_auxes)
        self.state = self._jit_step(self.state, self.aux, int(N),
                                    inj_auxes, ion_auxes, (), comp_auxes)
        self.iteration += int(N)
        lost = int(jax.device_get(self.state.migration_overflow))
        if lost > 0:
            msg = (f"{lost} particle(s) were dropped because a "
                   f"migration buffer or the per-rank particle "
                   f"capacity overflowed; increase migration_buffer "
                   f"or the species capacity.")
            if self.on_migration_overflow == "error":
                raise RuntimeError(msg)
            import warnings
            warnings.warn(msg, RuntimeWarning)
        return self.state

    # -- observation ------------------------------------------------------

    def get_interp_field(self, name, m=0):
        """Global physical-grid field (complex (Nz_global, Nr)),
        reassembled from the slab interiors."""
        spect_names = {"Ez": "Ez", "Bz": "Bz", "rho": "rho_prev",
                       "rho_prev": "rho_prev", "rho_next": "rho_next"}
        cfgl = self.config_local
        Nzl = cfgl.Nz
        if name in spect_names:
            F = getattr(self.state.spect, spect_names[name])
            out = []
            re = np.asarray(F.re).reshape(F.re.shape[0], self.ndev, Nzl,
                                          -1)
            im = np.asarray(F.im).reshape(F.im.shape[0], self.ndev, Nzl,
                                          -1)
            for i in range(self.ndev):
                slab = CArr(jnp.asarray(re[:, i]), jnp.asarray(im[:, i]))
                loc = tr.spect2interp_scal(self.aux.mats, slab)
                out.append(np.asarray(loc.re)[m, self.g:self.g + self.Nz_int]
                           + 1j * np.asarray(loc.im)[m,
                                                     self.g:self.g
                                                     + self.Nz_int])
            return np.concatenate(out, axis=0)
        # interp-space components are stored directly
        F = getattr(self.state.interp, name)
        re = np.asarray(F.re).reshape(F.re.shape[0], self.ndev, Nzl, -1)
        im = np.asarray(F.im).reshape(F.im.shape[0], self.ndev, Nzl, -1)
        out = [re[m, i, self.g:self.g + self.Nz_int]
               + 1j * im[m, i, self.g:self.g + self.Nz_int]
               for i in range(self.ndev)]
        return np.concatenate(out, axis=0)


def distribute_simulation(sim, n_devices=None, **kwargs):
    """Decompose a configured Simulation over the available devices.

    Call after all species / lasers / moving-window setup.  Returns a
    :class:`DistributedRun`; the original ``sim`` is left untouched and
    should no longer be stepped directly.
    """
    return DistributedRun(sim, n_devices=n_devices, **kwargs)
