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
        # migration_buffer=None -> auto-sized in make_multichip_step
        # from the (guard-clamped) exchange period and column occupancy
        self.multi_step, self.config_local = dom.make_multichip_step(
            config, tuple(sim.species_configs), options, mesh,
            axis_name=axis_name, migration_buffer=migration_buffer,
            n_guard=n_guard)
        # Species that run the resident column-padded fast path on the
        # mesh: their per-rank capacity must equal Nz_local * sort_K
        # and their initial packing must be the column-sorted layout
        # (the banded re-sort assumes it between full re-sorts).
        from ..core import step as step_mod
        self._resident_idx = step_mod._resident_indices(
            self.config_local, tuple(sim.species_configs), options,
            None)
        self.aux = build_field_aux(self.config_local, sim.smoother)
        self.g = self.config_local.n_guard
        self.Nz_int = self.config_local.Nz - 2 * self.g

        self.state = self._shard_state(sim.state)
        self._jit_step = jax.jit(self.multi_step, static_argnums=2,
                                 donate_argnums=0)
        self.iteration = int(sim.iteration)

        # Back-transformed (device-capture) diagnostics: build a second
        # step function that extracts their plane slices INSIDE the
        # device program every step (each rank slices its owned
        # interior, psum-reduced to a replicated result) -- the
        # decomposed analog of the single-chip capture chunks
        # (core/simulation.py) and of the reference's per-rank slice
        # extraction under MPI (boosted_field_diag.py:559-746).
        self._capture_writers = [
            w for w in list(sim.diags) + list(sim.checkpoints)
            if hasattr(w, "device_capture")]
        self._jit_capture_step = None
        if self._capture_writers:
            g = self.config_local.n_guard
            cap_fns = tuple(
                w.device_capture(config=self.config_local,
                                 mats=self.aux.mats,
                                 own=(g, self.Nz_int),
                                 axis_name=axis_name)
                for w in self._capture_writers)
            capture_step, _ = dom.make_multichip_step(
                config, tuple(sim.species_configs), options, mesh,
                axis_name=axis_name, migration_buffer=migration_buffer,
                n_guard=self.config_local.n_guard, capture_fns=cap_fns)
            self._jit_capture_step = jax.jit(
                capture_step, static_argnums=2, donate_argnums=0)

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

    def _resident_slots(self, z, dev, zmin_g, K):
        """Per-rank slot indices of the resident column-padded layout.

        Returns a list of int arrays: slot_of[i][j] is the slot (within
        rank i's block of Nz_local*K) of the j-th particle assigned to
        rank i -- column-major (column * K + within-column rank), i.e.
        the (Nz, K) padded layout the resident step expects between
        full re-sorts."""
        cfgl = self.config_local
        slots = []
        for i in range(self.ndev):
            sel = dev == i
            zmin_loc = zmin_g + (i * self.Nz_int - self.g) * cfgl.dz
            col = np.clip(np.floor((z[sel] - zmin_loc)
                                   / cfgl.dz).astype(int),
                          0, cfgl.Nz - 1)
            order = np.argsort(col, kind="stable")
            cs = col[order]
            # within-column rank of each (column-sorted) particle
            if len(cs):
                starts = np.r_[0, np.flatnonzero(np.diff(cs)) + 1]
                counts = np.diff(np.r_[starts, len(cs)])
                within = np.arange(len(cs)) - np.repeat(starts, counts)
                if within.max(initial=-1) >= K:
                    worst = int(counts.max())
                    raise ValueError(
                        f"Resident species: a z column of rank {i} "
                        f"holds {worst} particles > sort_K={K}. Pass "
                        f"a larger sort_K to add_new_species before "
                        f"distributing.")
            else:
                within = cs
            slot = np.empty(len(cs), dtype=int)
            slot[order] = cs * K + within
            slots.append(slot)
        return slots

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
        for si, sp in enumerate(state.species):
            arrays = {f.name: getattr(sp, f.name)
                      for f in dataclasses.fields(sp)}
            z = np.asarray(arrays["z"])
            w = np.asarray(arrays["w"])
            dev = np.clip(((z - zmin_g) // Lz_int).astype(int),
                          0, self.ndev - 1)
            dev = np.where(w != 0, dev, -1)
            max_count = max((int((dev == i).sum())
                             for i in range(self.ndev)), default=0)
            resident = si in self._resident_idx
            if resident:
                sc = self.sim.species_configs[si]
                cap = cfgl.Nz * sc.sort_K
                slot_of = self._resident_slots(z, dev, zmin_g, sc.sort_K)
            else:
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
                    if resident:
                        out[i * cap + slot_of[i]] = arr_np[sel]
                    else:
                        cnt = int(sel.sum())
                        out[i * cap:i * cap + cnt] = arr_np[sel]
                blocks[name] = jnp.asarray(out)
            if resident:
                # Dead-slot positions: park each dead slot at its own
                # row's column center so the column-sorted invariant
                # holds for every slot (live slots are masked by w)
                rows = (np.arange(self.ndev * cap) % cap) // sc.sort_K
                zmin_loc = (zmin_g
                            + ((np.arange(self.ndev * cap) // cap)
                               * self.Nz_int - self.g) * cfgl.dz)
                park = zmin_loc + (rows + 0.5) * cfgl.dz
                dead = np.asarray(blocks["w"]) == 0
                blocks["z"] = jnp.asarray(
                    np.where(dead, park.astype(np.asarray(
                        blocks["z"]).dtype), np.asarray(blocks["z"])))
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
        # Physically shard over the mesh.  Copy every leaf first:
        # device_put may ALIAS buffers whose sharding already matches
        # (replicated scalars), and the donating jit would then delete
        # the original sim.state leaves.
        specs = self._state_specs(state)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs)
        state = jax.tree_util.tree_map(jnp.array, state)
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
        """Advance the decomposed simulation N steps.

        Honors the diagnostics and checkpoints registered on the
        underlying Simulation (``sim.diags`` / ``sim.checkpoints``):
        the run is chunked to their period boundaries, the global state
        is gathered to the host and written through the SAME diagnostic
        classes as a single-chip run (the TPU analog of the reference's
        gather_grid/gather_ptcl + rank-0 writes,
        /root/reference/fbpic/openpmd_diag/generic_diag.py:124-166 and
        boundary_communicator.py:964-1222).
        """
        sim = self.sim
        inj_auxes = (tuple(sim._injector_auxes)
                     if sim.moving_win is not None else ())
        ion_auxes = tuple(sim._ionizer_auxes)
        comp_auxes = tuple(sim._compton_auxes)

        all_writers = list(sim.diags) + list(sim.checkpoints)
        writers = [w for w in all_writers
                   if not hasattr(w, "device_capture")]
        if all_writers and self.iteration == 0:
            self.sync_to_sim()
            for diag in sim.diags:
                diag.write(sim)

        done = 0
        while done < N:
            chunk = N - done
            if writers:
                period = min(getattr(d, "period", N) for d in writers)
                next_boundary = period - (self.iteration % period)
                chunk = min(chunk, max(1, next_boundary))
            antenna_series = self._antenna_series(chunk)
            if self._jit_capture_step is not None:
                self.state, caps = self._jit_capture_step(
                    self.state, self.aux, int(chunk), inj_auxes,
                    ion_auxes, antenna_series, comp_auxes)
            else:
                caps = None
                self.state = self._jit_step(
                    self.state, self.aux, int(chunk), inj_auxes,
                    ion_auxes, antenna_series, comp_auxes)
            done += chunk
            self.iteration += int(chunk)
            self._check_migration()
            if caps is not None:
                # Snapshot flushes gather particle views lazily --
                # refresh the host mirror first so back-transformed
                # PARTICLE-side state (if any) is current
                for w, cap in zip(self._capture_writers, caps):
                    w.process_chunk(sim, cap)
            if writers and any(
                    self.iteration % getattr(d, "period", N) == 0
                    for d in writers):
                self.sync_to_sim()
                for writer in writers:
                    writer.write(sim)
        return self.state

    def _antenna_series(self, chunk):
        """Host-precomputed antenna currents for one chunk (global
        coordinates; each rank masks the deposit to its owned slab)."""
        sim = self.sim
        if not sim.laser_antennas:
            return ()
        import dataclasses as _dc
        series_list = []
        for antenna in sim.laser_antennas:
            series = antenna.compute_series(
                self.iteration * sim.dt, chunk, self.sim.config.dz)
            series = _dc.replace(
                series, it0=jnp.asarray(self.iteration, jnp.int32))
            series_list.append(series)
        return tuple(series_list)

    def _check_migration(self):
        lost = int(jax.device_get(self.state.migration_overflow))
        n_sort = (0 if self.state.sort_overflow is None
                  else int(jax.device_get(self.state.sort_overflow)))
        if lost > 0:
            msg = (f"{lost} particle(s) were dropped because a "
                   f"migration buffer or the per-rank particle "
                   f"capacity overflowed; increase migration_buffer "
                   f"or the species capacity.")
            if self.on_migration_overflow == "error":
                raise RuntimeError(msg)
            import warnings
            warnings.warn(msg, RuntimeWarning)
        if n_sort > 0:
            # The single-chip auto-bump cannot re-shard mid-run: make
            # the overflow loud instead of silently dropping charge
            # (for resident species, dropping the particles themselves)
            msg = (f"{n_sort} particle-step(s) exceeded a z column's "
                   f"sorted-deposit capacity on the mesh; pass a "
                   f"larger sort_K to add_new_species before "
                   f"distributing.")
            if self.on_migration_overflow == "error":
                raise RuntimeError(msg)
            import warnings
            warnings.warn(msg, RuntimeWarning)
            import dataclasses as _dc
            self.state = _dc.replace(
                self.state, sort_overflow=jax.device_put(
                    jnp.zeros((), jnp.int32),
                    NamedSharding(self.mesh, P())))

    # -- gather to host ----------------------------------------------------

    def _unslice_spect(self, F):
        """Concat of per-slab spectral CArr -> global single-chip
        spectral CArr (inverse of _reslice_spect): local inverse z-DFT
        to partial space, slab-interior concatenation, global forward
        z-DFT."""
        Nzl = self.config_local.Nz
        Nm = F.re.shape[0]
        re = np.asarray(F.re).reshape(Nm, self.ndev, Nzl, -1)
        im = np.asarray(F.im).reshape(Nm, self.ndev, Nzl, -1)
        parts_re, parts_im = [], []
        for i in range(self.ndev):
            slab = CArr(jnp.asarray(re[:, i]), jnp.asarray(im[:, i]))
            (partial,) = tr.ifft_z_many(self.aux.mats, [slab])
            parts_re.append(np.asarray(partial.re)[:,
                                                   self.g:self.g
                                                   + self.Nz_int])
            parts_im.append(np.asarray(partial.im)[:,
                                                   self.g:self.g
                                                   + self.Nz_int])
        glob = CArr(jnp.asarray(np.concatenate(parts_re, axis=1)),
                    jnp.asarray(np.concatenate(parts_im, axis=1)))
        (out,) = tr.fft_z_many(self.sim.aux.mats, [glob])
        return out

    def _unslice_interp(self, F):
        Nzl = self.config_local.Nz
        Nm = F.re.shape[0]
        re = np.asarray(F.re).reshape(Nm, self.ndev, Nzl, -1)
        im = np.asarray(F.im).reshape(Nm, self.ndev, Nzl, -1)
        sl = slice(self.g, self.g + self.Nz_int)
        return CArr(
            jnp.asarray(np.concatenate(
                [re[:, i, sl] for i in range(self.ndev)], axis=1)),
            jnp.asarray(np.concatenate(
                [im[:, i, sl] for i in range(self.ndev)], axis=1)))

    def gather_state(self):
        """Reassemble a global single-chip SimState from the sharded
        state (fields from slab interiors, live particles from all
        rank blocks), matching the structure of ``sim.state``."""
        sim = self.sim
        state = jax.device_get(self.state)

        spect_fields = {}
        for f in dataclasses.fields(state.spect):
            val = getattr(state.spect, f.name)
            spect_fields[f.name] = (None if val is None
                                    else self._unslice_spect(val))
        spect = type(state.spect)(**spect_fields)

        interp_fields = {}
        for f in dataclasses.fields(state.interp):
            val = getattr(state.interp, f.name)
            interp_fields[f.name] = (None if val is None
                                     else self._unslice_interp(val))
        interp = type(state.interp)(**interp_fields)

        zmin_g = float(np.asarray(state.zmin).ravel()[0])
        Lz = sim.config.Nz * sim.config.dz
        z_park = zmin_g + 0.5 * Lz

        species = []
        for sp_d, sp_t in zip(state.species, sim.state.species):
            cap_t = sp_t.w.shape[0]
            w_all = np.asarray(sp_d.w)
            live = w_all != 0
            n_live = int(live.sum())
            if n_live > cap_t:
                raise RuntimeError(
                    f"Gathered particle count ({n_live}) exceeds the "
                    f"single-chip capacity ({cap_t}); increase the "
                    f"species capacity before distributing.")
            updates = {}
            for f in dataclasses.fields(sp_t):
                arr_t = getattr(sp_t, f.name)
                arr_d = getattr(sp_d, f.name)
                if arr_t is None:
                    continue
                # (metadata-only access on arr_t: its buffer may have
                # been deleted by the donating jit if device_put
                # aliased it)
                if arr_t.ndim == 0:
                    # replicated scalars (ids counters, inj_z_end, ...)
                    if f.name == "next_free":
                        updates[f.name] = jnp.asarray(
                            n_live % cap_t, arr_t.dtype)
                    else:
                        updates[f.name] = jnp.asarray(
                            np.asarray(arr_d), arr_t.dtype)
                    continue
                out = np.zeros(cap_t, arr_t.dtype)
                if f.name == "inv_gamma":
                    out[:] = 1.0
                elif f.name == "z":
                    out[:] = z_park
                out[:n_live] = np.asarray(arr_d)[live]
                updates[f.name] = jnp.asarray(out)
            species.append(dataclasses.replace(sp_t, **updates))

        seed = sim.state.seed
        if seed is not None:
            seed = jnp.asarray(np.asarray(state.seed), seed.dtype)
        return dataclasses.replace(
            sim.state, spect=spect, interp=interp, species=tuple(species),
            time=jnp.asarray(np.asarray(state.time),
                             sim.state.time.dtype),
            zmin=jnp.asarray(zmin_g, sim.state.zmin.dtype),
            iteration=jnp.asarray(np.asarray(state.iteration),
                                  jnp.int32),
            mw_zref=jnp.asarray(np.asarray(state.mw_zref),
                                sim.state.mw_zref.dtype),
            seed=seed,
            migration_overflow=None,
        )

    def sync_to_sim(self):
        """Install the gathered global state into the underlying
        Simulation (so its diagnostics/checkpoints/accessors see the
        current distributed data)."""
        self.sim.state = self.gather_state()
        return self.sim

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
