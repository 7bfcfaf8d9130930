"""User-facing Simulation API, mirroring the reference's surface.

The constructor/arguments follow /root/reference/fbpic/main.py:51-344 so
that reference input scripts port over unchanged; internally everything
is re-designed: the state is one pytree, the PIC cycle is one jit step.
"""
import dataclasses
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import c, e, m_e
from ..fields.solver import (
    GridConfig, FieldAux, SpectralFields, InterpFields, build_field_aux,
)
from ..fields import transform as tr
from ..fields.smoothing import BinomialSmoother
from ..particles.state import (
    SpeciesConfig, ParticleState, generate_evenly_spaced, make_particle_state,
)
from .state import SimState
from . import step as step_mod
from .step import StepOptions, make_step


def _on_accelerator():
    """True when the default JAX backend is a TPU/GPU (not CPU)."""
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def adapt_to_grid(x, p_xmin, p_xmax, p_nx, ncells_empty=0):
    """Adapt p_xmin/p_xmax to fall exactly on the grid x.

    Reference: /root/reference/fbpic/main.py:1056-1111.
    """
    xmin = x.min()
    xmax = x.max()
    dx = x[1] - x[0]

    if p_xmin < xmin - 0.5 * dx:
        p_xmin = xmin - 0.5 * dx
    if p_xmax > xmax + (0.5 - ncells_empty) * dx:
        p_xmax = xmax + (0.5 - ncells_empty) * dx

    x_load = x[(x > p_xmin) & (x < p_xmax)]
    Npx = len(x_load) * p_nx
    if Npx > 0:
        p_xmin = x_load.min() - 0.5 * dx
        p_xmax = x_load.max() + 0.5 * dx
    return p_xmin, p_xmax, Npx


class SpeciesView:
    """Numpy-flavored view of one species inside the device SimState.

    Mimics the attribute access of the reference `Particles` object
    (ptcl.x, ptcl.ux, ...) for input scripts and tests: reads return the
    active slice as numpy; writes update the device state in place.
    """
    _arrays = ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w")

    def __init__(self, sim, index):
        object.__setattr__(self, "_sim", sim)
        object.__setattr__(self, "_index", index)

    @property
    def _state(self) -> ParticleState:
        return self._sim.state.species[self._index]

    @property
    def config(self) -> SpeciesConfig:
        return self._sim.species_configs[self._index]

    @property
    def q(self):
        return self.config.q

    @property
    def m(self):
        return self.config.m

    @property
    def _can_grow(self):
        """Whether particles can be created into this species at runtime
        (continuous injection, or target of ionization / Compton)."""
        sim = self._sim
        if sim._injector_configs[self._index] is not None:
            return True
        for sc in sim.species_configs:
            if sc.ionizer is not None \
                    and (sc.ionizer.target_index == self._index
                         or self._index in sc.ionizer.per_level_targets):
                return True
            if sc.compton is not None \
                    and sc.compton.target_index == self._index:
                return True
        return False

    @property
    def Ntot(self):
        # With runtime particle creation, live particles can be anywhere
        # in the capacity array (dead slots carry w = 0)
        if self._can_grow:
            return self._state.capacity
        return self._sim._species_counts[self._index]

    def __getattr__(self, name):
        if name in self._arrays:
            return np.asarray(getattr(self._state, name))[:self.Ntot]
        raise AttributeError(name)

    def track(self, comm=None):
        """Enable unique particle ids for this species
        (reference API: Particles.track)."""
        from ..particles.tracking import enable_tracking
        enable_tracking(self._sim, self)

    def activate_compton(self, target_species, laser_energy,
                         laser_wavelength, laser_waist, laser_ctau,
                         laser_initial_z0, ratio_w_electron_photon=1.0,
                         boost=None):
        """Activate Compton scattering against a rigid Gaussian laser
        (reference API: particles.py:394, activate_compton)."""
        from ..particles.compton import ComptonConfig, build_compton_aux
        sim = self._sim
        idx = self._index
        cfg = ComptonConfig(target_index=target_species._index,
                            ratio_w_electron_photon=ratio_w_electron_photon)
        sim.species_configs[idx] = dataclasses.replace(
            sim.species_configs[idx], compton=cfg)
        sim._compton_auxes[idx] = build_compton_aux(
            laser_energy, laser_wavelength, laser_waist, laser_ctau,
            laser_initial_z0, boost=boost or sim.boost)
        sim._ensure_capacity(cfg.target_index, cfg.buffer_size)
        sim._step_fns.clear()

    def make_ionizable(self, element, target_species, level_start=0,
                       level_max=None):
        """Make this species ionizable (ADK model).

        Reference API: particles.py:441 (make_ionizable).
        `target_species` is the SpeciesView receiving the new electrons,
        or a dict {level: SpeciesView} routing the electrons from each
        ionizable level to its own species (reference
        ionizer.py:123-146).
        """
        import jax.numpy as jnp
        from ..particles.ionization import (
            IonizerConfig, build_ionizer_aux)
        sim = self._sim
        idx = self._index
        ion_aux, n_levels = build_ionizer_aux(element, sim.dt, level_max)
        if level_max is None:
            level_max = n_levels
        per_level = ()
        if isinstance(target_species, dict):
            for level in range(level_start, level_max):
                if level not in target_species:
                    raise ValueError(
                        "When passing a dict for `target_species`, its "
                        "keys must be the ionizable levels "
                        f"{level_start}..{level_max - 1} of {element}.")
            per_level = tuple(target_species[level]._index
                              for level in range(level_start, level_max))
            target_index = per_level[0]
        else:
            target_index = target_species._index
        cfg = IonizerConfig(element=element, level_start=level_start,
                            level_max=level_max,
                            target_index=target_index,
                            per_level_targets=per_level)
        # Charge becomes the elementary charge: deposition and push use
        # ionization_level * q as the per-particle charge (reference:
        # particles.py:488-490 sets self.q = e)
        sim.species_configs[idx] = dataclasses.replace(
            sim.species_configs[idx], ionizable=True, ionizer=cfg, q=e)
        # Add the ionization_level array to the particle state
        sp = sim.state.species[idx]
        lev = jnp.full(sp.capacity, level_start, dtype=jnp.int32)
        lev = jnp.where(sp.w != 0, lev, 0)
        sp = dataclasses.replace(sp, ionization_level=lev)
        species = list(sim.state.species)
        species[idx] = sp
        sim.state = dataclasses.replace(sim.state, species=tuple(species))
        sim._ionizer_auxes[idx] = ion_aux
        # A default-capacity (empty) target species must at least hold
        # one full creation buffer, or write_ring would wrap within a
        # single append; ring overflow later auto-grows it further
        # (_consume_overflow_counters).
        for tgt in set(per_level) or {target_index}:
            sim._ensure_capacity(tgt, cfg.buffer_size)
        sim._step_fns.clear()

    def __setattr__(self, name, value):
        if name in self._arrays:
            sim = self._sim
            idx = self._index
            n = self.Ntot
            sp = sim.state.species[idx]
            arr = getattr(sp, name)
            new = arr.at[:n].set(jnp.asarray(value, dtype=arr.dtype))
            sp = dataclasses.replace(sp, **{name: new})
            species = list(sim.state.species)
            species[idx] = sp
            sim.state = dataclasses.replace(sim.state,
                                            species=tuple(species))
        else:
            object.__setattr__(self, name, value)


class Simulation:
    """Top-level simulation object (API-compatible with the reference)."""

    def __init__(self, Nz, zmax, Nr, rmax, Nm, dt,
                 p_zmin=-np.inf, p_zmax=np.inf, p_rmin=0, p_rmax=np.inf,
                 p_nz=None, p_nr=None, p_nt=None, n_e=None, zmin=0.0,
                 n_order=-1, dens_func=None, filter_currents=True,
                 v_comoving=None, use_galilean=True,
                 initialize_ions=False, use_cuda=False, n_guard=None,
                 n_damp=None, exchange_period=None,
                 current_correction="curl-free",
                 boundaries=None,
                 gamma_boost=None, use_all_mpi_ranks=True,
                 particle_shape="linear", verbose_level=1,
                 smoother=None, use_ruyten_shapes=True,
                 use_modified_volume=True, random_seed=None):
        if boundaries is None:
            boundaries = {"z": "periodic", "r": "reflective"}
        if isinstance(boundaries, str):
            boundaries = {"z": boundaries, "r": "reflective"}

        self.boundaries = boundaries
        # Parameter-scan parallelism (reference main.py use_all_mpi_ranks:
        # each rank runs an INDEPENDENT simulation).  TPU analog: pin
        # this simulation to one device of a multi-device host so N
        # processes (or N Simulation objects) can run one scan point
        # per chip; select with FBPIC_TPU_TASK_DEVICE=<k> (default 0).
        self.use_all_devices = use_all_mpi_ranks
        if not use_all_mpi_ranks:
            import os as _os
            k = int(_os.environ.get("FBPIC_TPU_TASK_DEVICE", "0"))
            devs = jax.devices()
            self.task_device = devs[k % len(devs)]
            jax.config.update("jax_default_device", self.task_device)
        else:
            self.task_device = None
        self.verbose_level = int(verbose_level)
        self._banner_printed = False
        boundaries_z = boundaries.get("z", "periodic")
        dz = (zmax - zmin) / Nz

        # For open z boundaries, the internal grid is enlarged by
        # guard + damping + injection cells at each end; these absorb the
        # periodic wrap-around of the spectral solver (reference:
        # boundary_communicator.py:224-278).
        if boundaries_z == "open":
            if n_guard is None:
                if n_order == -1:
                    n_guard_ = 64
                else:
                    from ..fields.stencil import get_stencil_reach
                    n_guard_ = get_stencil_reach(
                        Nz, dz, c * dt, n_order, v_comoving,
                        use_galilean if v_comoving is not None else False) + 1
            else:
                n_guard_ = n_guard
            if n_damp is None:
                n_damp = {"z": 64, "r": 32}
            nz_damp_ = n_damp["z"] if isinstance(n_damp, dict) else n_damp
            n_inject_ = n_guard_ // 2
        else:
            n_guard_ = nz_damp_ = n_inject_ = 0

        nd = n_guard_ + nz_damp_ + n_inject_
        Nz_total = Nz + 2 * nd
        zmin_total = zmin - nd * dz
        self.Nz_phys = Nz
        self.nd_edge = nd

        # Period of particle removal / injection / fresh rho_prev
        # deposits.  Sized so particles cannot cross half the guard
        # region between exchanges (reference:
        # boundary_communicator.py:280-304, incl. the factor-2 safety
        # for moving-window / Galilean runs).
        if exchange_period is None:
            if boundaries_z == "open":
                cells_per_step = 2.0 * c * dt / dz
                exchange_period = max(
                    1, int((n_guard_ / 2 - 3) / cells_per_step))
            else:
                exchange_period = 1
        self.exchange_period = max(1, int(exchange_period))

        # Fused sorted-dense deposition: default on accelerators (perf)
        # AND on any float32 run (the fused path also computes the
        # per-particle d(rho) the float32 current correction needs).
        # f64 CPU tests keep the scatter path.  User-overridable.
        from ..utils.dtypes import x64_enabled
        self.use_fused_deposit = _on_accelerator() or not x64_enabled()

        self.config = GridConfig(
            Nz=Nz_total, Nr=Nr, Nm=Nm,
            dz=dz, dr=rmax / Nr, rmax=rmax, dt=dt,
            n_order=n_order, v_comoving=v_comoving,
            use_galilean=(use_galilean if v_comoving is not None else False),
            use_pml=(boundaries.get("r") == "open"),
            current_correction=current_correction,
            particle_shape=particle_shape,
            boundaries_z=boundaries_z,
            n_guard=n_guard_, nz_damp=nz_damp_, n_inject=n_inject_,
            nr_damp=(n_damp["r"] if isinstance(n_damp, dict)
                     and boundaries.get("r") == "open" else
                     (32 if boundaries.get("r") == "open" else 0)),
        )
        self.zmax = zmax
        self.dt = dt
        self.filter_currents = filter_currents
        self.use_galilean = self.config.use_galilean
        self.v_comoving = v_comoving

        self.boost = None
        if gamma_boost is not None:
            from ..lpa_utils.boosted_frame import BoostConverter
            self.boost = BoostConverter(gamma_boost)

        self.smoother = smoother or BinomialSmoother(1, False)
        self.aux = build_field_aux(
            self.config, self.smoother,
            use_ruyten_shapes=use_ruyten_shapes,
            use_modified_volume=use_modified_volume,
        )

        self._rng = np.random.RandomState(random_seed)
        # Device-side PRNG root: derived from random_seed so that
        # in-jit draws (injection noise, ionization, Compton) are
        # reproducible per seed and differ between seeds.
        _seed_rs = np.random.RandomState(
            None if random_seed is None else random_seed + 987654321)
        self._device_seed = int(_seed_rs.randint(0, 2**31 - 1))

        # Initial (empty) state.  NOTE: scalars use explicit (strong)
        # dtypes -- weak-typed scalars would change aval on the first
        # step and trigger a full recompile of the second step() call.
        from ..utils.dtypes import real_dtype
        rdt = real_dtype()
        self.state = SimState(
            spect=SpectralFields.zeros(self.config),
            interp=InterpFields.zeros(self.config),
            species=(),
            time=jnp.asarray(0.0, dtype=rdt),
            zmin=jnp.asarray(float(zmin_total), dtype=rdt),
            iteration=jnp.asarray(0, dtype=jnp.int32),
            mw_zref=jnp.asarray(float(zmin_total), dtype=rdt),
            seed=jnp.asarray(self._device_seed, dtype=jnp.uint32),
            # Materialized from the start: a None -> array flip after
            # the first step() would change the state pytree structure
            # and force a full retrace of the (n_steps-generic)
            # multi_step on the SECOND call
            sort_overflow=jnp.zeros((), jnp.int32),
            ring_overwrite=jnp.zeros((), jnp.int32),
        )
        self.species_configs = []
        self._species_counts = []
        self.moving_win = None          # set by set_moving_window
        self._injector_configs = []     # per species: InjectorConfig | None
        self._injector_auxes = []       # per species: InjectorAux | None
        self._ionizer_auxes = []        # per species: IonizerAux | None
        self._compton_auxes = []        # per species: ComptonAux | None

        self.ptcl = []          # list of SpeciesView
        self.diags = []
        self.checkpoints = []
        self.laser_antennas = []
        self.external_fields = []
        self.mirrors = []
        self.comm = None        # populated by the multi-chip layer
        # Reference-API alias: scripts pass `sim.fld` to FieldDiagnostic
        # (reference main.py keeps fields in a separate Fields object;
        # here the Simulation owns them directly)
        self.fld = self

        self._step_fns = {}     # cache: StepOptions -> jitted step

        # Create the initial electron species (reference behavior)
        if n_e is not None:
            self.add_new_species(
                q=-e, m=m_e, n=n_e, dens_func=dens_func,
                p_nz=p_nz, p_nr=p_nr, p_nt=p_nt,
                p_zmin=p_zmin, p_zmax=p_zmax, p_rmin=p_rmin, p_rmax=p_rmax,
            )
            if initialize_ions:
                self.add_new_species(
                    q=e, m=1836.2 * m_e, n=n_e, dens_func=dens_func,
                    p_nz=p_nz, p_nr=p_nr, p_nt=p_nt,
                    p_zmin=p_zmin, p_zmax=p_zmax,
                    p_rmin=p_rmin, p_rmax=p_rmax,
                )

    # -----------------------------------------------------------------
    # Grid coordinate helpers
    # -----------------------------------------------------------------
    @property
    def time(self):
        return float(self.state.time)

    @property
    def iteration(self):
        return int(self.state.iteration)

    @property
    def zmin(self):
        return float(self.state.zmin)

    def grid_z(self, physical=True):
        """z positions of grid cells; physical=True excludes the
        guard/damp/injection cells of open boundaries."""
        z_full = self.zmin + (0.5 + np.arange(self.config.Nz)) * self.config.dz
        if physical and self.nd_edge > 0:
            return z_full[self.nd_edge:self.nd_edge + self.Nz_phys]
        return z_full

    def grid_r(self):
        return (0.5 + np.arange(self.config.Nr)) * self.config.dr

    # -----------------------------------------------------------------
    # Species management
    # -----------------------------------------------------------------
    def add_new_species(self, q, m, n=None, dens_func=None,
                        p_nz=None, p_nr=None, p_nt=None,
                        p_zmin=-np.inf, p_zmax=np.inf,
                        p_rmin=0, p_rmax=np.inf,
                        uz_m=0.0, ux_m=0.0, uy_m=0.0,
                        uz_th=0.0, ux_th=0.0, uy_th=0.0,
                        continuous_injection=True,
                        boost_positions_in_dens_func=False,
                        is_tracer=False, capacity=None, name=None,
                        sort_K=None):
        """Create a new species; returns a SpeciesView.

        sort_K: per-column slot capacity for the sorted dense (MXU)
        deposition path.  None = auto (enabled for large linear-shape
        species at 2x the initial max column occupancy); 0 = disable
        (use the scatter deposition path)."""
        injector_cfg = None
        injector_aux = None
        if n is not None:
            for var in (p_nz, p_nr, p_nt):
                if var is None:
                    raise ValueError(
                        "If `n` is passed, `p_nz`, `p_nr`, `p_nt` are "
                        "required too.")
            # Boosted frame: convert lab-frame quantities
            # (reference: main.py:909-967)
            if self.boost is not None:
                gamma_m = np.sqrt(1. + uz_m**2 + ux_m**2 + uy_m**2)
                beta_m_lab = uz_m / gamma_m
                p_zmin, p_zmax = self.boost.copropag_length(
                    [p_zmin, p_zmax], beta_object=beta_m_lab)
                n, = self.boost.copropag_density([n],
                                                 beta_object=beta_m_lab)
                if uz_m == 0:
                    uz_th = self.boost.gamma0 * uz_th
                else:
                    uz_th = self.boost.gamma0 *                         (1. - self.boost.beta0 * beta_m_lab) * uz_th
                uz_m = self.boost.gamma0 * (
                    uz_m - self.boost.beta0 * gamma_m)
                if boost_positions_in_dens_func and dens_func is not None:
                    from ..particles.state import _check_dens_func_arguments
                    coef = self.boost.gamma0 * (
                        1 - beta_m_lab * self.boost.beta0)
                    user_func = dens_func
                    if _check_dens_func_arguments(dens_func) == ["z", "r"]:
                        dens_func = lambda z, r: user_func(coef * z, r)
                    else:
                        dens_func = (lambda x, y, z:
                                     user_func(x, y, coef * z))
            p_zmin_, p_zmax_, Npz = adapt_to_grid(
                self.grid_z(), p_zmin, p_zmax, p_nz)
            p_rmin_, p_rmax_, Npr = adapt_to_grid(
                self.grid_r(), p_rmin, p_rmax, p_nr)
            Ntot, x, y, z, ux, uy, uz, inv_gamma, w = generate_evenly_spaced(
                Npz, p_zmin_, p_zmax_, Npr, p_rmin_, p_rmax_, p_nt, n,
                dens_func, ux_m, uy_m, uz_m, ux_th, uy_th, uz_th,
                rng=self._rng)
            if continuous_injection:
                from ..particles.injection import (
                    InjectorConfig, build_injector_aux)
                dz_particles = self.config.dz / p_nz
                dens_args = None
                if dens_func is not None:
                    from ..particles.state import _check_dens_func_arguments
                    dens_args = ("xyz" if _check_dens_func_arguments(
                        dens_func) == ["x", "y", "z"] else "zr")
                # Columns accumulated over one exchange period (window
                # moves <= c dt per step), plus margin
                max_cols = int(np.ceil(
                    self.exchange_period * (c * self.config.dt
                                            / self.config.dz) * p_nz)) + 4
                from ..particles.injection import ensure_traceable_dens
                injector_cfg = InjectorConfig(
                    dz_particles=dz_particles, n=n,
                    ux_m=ux_m, uy_m=uy_m, uz_m=uz_m,
                    ux_th=ux_th, uy_th=uy_th, uz_th=uz_th,
                    dens_func=ensure_traceable_dens(
                        dens_func, dens_args or "zr"),
                    dens_args=dens_args or "zr",
                    max_inject_cols=max_cols)
                injector_aux = build_injector_aux(
                    Npr, p_rmin_, p_rmax_, p_nt, injector_cfg,
                    rng=self._rng)
                # Ring buffer must hold a whole box worth of plasma.
                # Particles only ever live inside the removal bounds
                # (remove_outside_particles strips beyond n_guard from
                # either edge every exchange), so size from that span,
                # not the full padded grid: every per-particle op
                # (sort, gathers, pushes) scales with capacity, and the
                # guard/damp padding is ~30% of Nz on production boxes.
                margin = 2 * max(self.config.n_guard, 1)
                cols_live = int(np.ceil(
                    (self.config.Nz - margin) * self.config.dz
                    / dz_particles))
                col_size = Npr * p_nt
                needed = int(1.2 * cols_live * col_size)
                capacity = max(capacity or 0, needed,
                               int(1.2 * max(Ntot, 1)))
        else:
            Ntot = 0
            x = y = z = ux = uy = uz = inv_gamma = w = np.empty(0)

        if sort_K is None:
            # Auto: on TPU the fused sorted-dense deposition
            # (sorted_deposit.deposit_rho_J_sorted) replaces the two
            # scatter passes with one column sort + padded gather +
            # MXU one-hot contractions and measures ~1.8x faster
            # (14.5 vs 25.5 ms at 576k particles, v5e).  Size the
            # per-column capacity at 2x the initial maximum column
            # occupancy (round up to a lane multiple).  On CPU
            # (tests) the scatter path stays the default.
            from ..utils.dtypes import x64_enabled
            if ((_on_accelerator() or not x64_enabled()) and Ntot > 0
                    and self.config.particle_shape in ("linear", "cubic")
                    and not is_tracer):
                cols = np.floor((np.asarray(z) - self.zmin)
                                / self.config.dz).astype(int)
                occ = np.bincount(cols[(cols >= 0)
                                       & (cols < self.config.Nz)],
                                  minlength=self.config.Nz).max()
                # 1.5x margin; column overflow is counted in-jit every
                # step and auto-bumps K (_consume_overflow_counters)
                sort_K = int(-(-3 * max(int(occ), 86) // 2 // 128) * 128)
            else:
                sort_K = 0

        # Resident column-padded layout (step._resident_indices): the
        # species' storage IS the flattened (Nz, K) sort layout, so the
        # step gathers fields with an MXU contraction instead of the
        # serialized per-index gather and sorts only once per step.
        # Requires capacity == Nz * sort_K; only worth it when that is
        # not wildly larger than the ring the species would need anyway.
        resident = False
        if (int(sort_K) > 0 and not is_tracer and self.use_fused_deposit
                and self.config.particle_shape == "linear"):
            cap_resident = self.config.Nz * int(sort_K)
            if cap_resident >= (capacity or 0):
                capacity = cap_resident
                resident = True

        # Re-sort strategy for resident species: the flat payload sort
        # + (Nz, K) relayout dominates the TPU step (~13 of 26 ms at
        # the bench size), but positions move at most
        # band = ceil((c + |v_galilean|) * dt / dz) columns per step,
        # so the per-step banded re-sort (one batched row-wise sort
        # over the 2*band+1 neighbor rows, everything staying in the
        # tiled layout) replaces it whenever the band is small; the
        # step still runs the flat sort on the storage-rewriting
        # exchange/injection steps.  FBPIC_TPU_RESORT=full opts out.
        resort = "full"
        if os.environ.get("FBPIC_TPU_SORT_EVERY") is not None:
            warnings.warn(
                "FBPIC_TPU_SORT_EVERY was removed: resident species "
                "now re-sort every step (banded). Use "
                "FBPIC_TPU_RESORT=full to opt out of the banded "
                "re-sort.", stacklevel=2)
        if resident and os.environ.get(
                "FBPIC_TPU_RESORT", "banded") == "banded":
            vg = abs(self.config.v_comoving) if (
                self.config.use_comoving
                and self.config.use_galilean) else 0.0
            # Mirrors step.py's analytic band (the f32 knife edge is
            # covered by the full-sort fallback there, not a margin);
            # must stay in sync with the value used there.
            band = max(1, int((c + vg) * self.config.dt
                              / self.config.dz - 1e-9) + 1)
            if band <= 2:
                resort = "banded"

        sc = SpeciesConfig(
            q=q, m=m, particle_shape=self.config.particle_shape,
            is_tracer=is_tracer,
            name=name or f"species{len(self.species_configs)}",
            sort_K=int(sort_K),
            resident=resident,
            resort=resort,
        )
        pstate = make_particle_state(x, y, z, ux, uy, uz, inv_gamma, w,
                                     capacity=capacity)
        if injector_cfg is not None:
            rdt = pstate.z.dtype
            z_end = (float(np.max(z)) + 0.5 * injector_cfg.dz_particles
                     if Ntot > 0 else float(self.zmax))
            pstate = dataclasses.replace(
                pstate,
                next_free=jnp.asarray(Ntot, dtype=jnp.int32),
                inj_z_end=jnp.asarray(z_end, dtype=rdt),
            )
        self.species_configs.append(sc)
        self._species_counts.append(Ntot)
        self._injector_configs.append(injector_cfg)
        self._injector_auxes.append(injector_aux)
        self._ionizer_auxes.append(None)
        self._compton_auxes.append(None)
        self.state = dataclasses.replace(
            self.state, species=self.state.species + (pstate,))
        view = SpeciesView(self, len(self.species_configs) - 1)
        self.ptcl.append(view)
        self._step_fns.clear()  # species set changed; re-jit
        return view

    # -----------------------------------------------------------------
    # Field access (for tests / diagnostics)
    # -----------------------------------------------------------------
    def get_interp_field(self, name, m=None):
        """Return an interpolation-grid field as numpy (Nm, Nz, Nr).

        name in {Er, Et, Ez, Br, Bt, Bz} (live in state) or
        {rho, Jr, Jt, Jz} (computed on the fly from spectral space).
        """
        if name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
            arr = getattr(self.state.interp, name)
        elif name == "rho":
            arr = tr.spect2interp_scal(self.aux.mats,
                                       self.state.spect.rho_prev)
        elif name in ("Jr", "Jt"):
            Jr, Jt = tr.spect2interp_vect(
                self.aux.mats, self.state.spect.Jp, self.state.spect.Jm)
            arr = Jr if name == "Jr" else Jt
        elif name == "Jz":
            arr = tr.spect2interp_scal(self.aux.mats, self.state.spect.Jz)
        else:
            raise ValueError(
                f"Unknown field {name!r}; expected one of Er, Et, Ez, Br, "
                "Bt, Bz, rho, Jr, Jt, Jz")
        arr = arr.to_numpy()
        if self.nd_edge > 0:
            arr = arr[:, self.nd_edge:self.nd_edge + self.Nz_phys, :]
        return arr if m is None else arr[m]

    def set_interp_EB(self, **fields):
        """Overwrite interpolation-grid E/B components (numpy arrays) and
        refresh spectral space accordingly."""
        interp = self.state.interp
        from ..utils.complex_arr import CArr
        updates = {}
        for name, value in fields.items():
            ref = getattr(interp, name)
            updates[name] = CArr.from_numpy(np.asarray(value), ref.dtype)
        interp = dataclasses.replace(interp, **updates)
        spect = step_mod.interp2spect_EB(self.aux, interp, self.state.spect,
                                         use_pml=self.config.use_pml)
        self.state = dataclasses.replace(self.state, interp=interp,
                                         spect=spect)

    # -----------------------------------------------------------------
    # Deposition helpers (initialization / diagnostics)
    # -----------------------------------------------------------------
    def deposit(self, fieldtype, update_spectral=True, exchange=False):
        """Deposit 'rho_prev'/'rho_next'/'J' from the current particles."""
        if fieldtype.startswith("rho"):
            rho = step_mod.deposit_rho_spect(
                self.config, self.aux, self.state.species,
                tuple(self.species_configs), self.state.zmin)
            if self.filter_currents:
                from ..fields import psatd_push as psp
                rho = psp.filter_scalar(rho, self.aux.filter_z,
                                        self.aux.filter_r)
            self.state = dataclasses.replace(
                self.state,
                spect=dataclasses.replace(self.state.spect,
                                          **{fieldtype: rho}))
        elif fieldtype == "J":
            Jp, Jm, Jz = step_mod.deposit_J_spect(
                self.config, self.aux, self.state.species,
                tuple(self.species_configs), self.state.zmin)
            if self.filter_currents:
                from ..fields import psatd_push as psp
                Jp, Jm, Jz = psp.filter_vector(
                    Jp, Jm, Jz, self.aux.filter_z, self.aux.filter_r)
            self.state = dataclasses.replace(
                self.state,
                spect=dataclasses.replace(self.state.spect,
                                          Jp=Jp, Jm=Jm, Jz=Jz))
        else:
            raise ValueError(fieldtype)

    # -----------------------------------------------------------------
    # The PIC loop
    # -----------------------------------------------------------------
    def _get_step_fn(self, options: StepOptions):
        key = options
        if key not in self._step_fns:
            from .step import make_multi_step, make_prepare
            self._step_fns[key] = (
                make_multi_step(self.config, tuple(self.species_configs),
                                options),
                make_prepare(self.config, tuple(self.species_configs),
                             options),
            )
        return self._step_fns[key]

    def deposit_single_species_rho(self, view):
        """Deposit the charge density of one species (diagnostics only).

        Returns numpy complex (Nm, Nz_phys, Nr).
        """
        from ..particles.deposit import deposit_rho_linear
        from ..fields import psatd_push as psp
        idx = view._index
        sp = self.state.species[idx]
        sc = self.species_configs[idx]
        w_eff = sp.w
        if sp.ionization_level is not None:
            w_eff = w_eff * sp.ionization_level.astype(sp.w.dtype)
        rho = deposit_rho_linear(
            sp.x, sp.y, sp.z, w_eff, sc.q, self.config.Nm,
            1.0 / self.config.dz, self.state.zmin, self.config.Nz,
            1.0 / self.config.dr, 0.0, self.config.Nr,
            self.aux.ruyten_linear,
            zfold=("periodic" if self.config.boundaries_z == "periodic"
                   else "clamp"))
        rho = (rho * self.aux.invvol[:, None, :]).to_numpy()
        if self.nd_edge > 0:
            rho = rho[:, self.nd_edge:self.nd_edge + self.Nz_phys, :]
        return rho

    def deposit_species_rho_J_full(self, view):
        """Deposit rho and J of one species on the FULL internal grid.

        Returns numpy complex arrays (Nm, Nz_internal, Nr) -- used by
        host-side global solves (space charge).
        """
        from ..particles.deposit import deposit_rho_J_linear
        idx = view._index
        sp = self.state.species[idx]
        sc = self.species_configs[idx]
        rho, Jr, Jt, Jz = deposit_rho_J_linear(
            sp.x, sp.y, sp.z, sp.w, sc.q,
            sp.ux, sp.uy, sp.uz, sp.inv_gamma, self.config.Nm,
            1.0 / self.config.dz, self.state.zmin, self.config.Nz,
            1.0 / self.config.dr, 0.0, self.config.Nr,
            self.aux.ruyten_linear,
            zfold=("periodic" if self.config.boundaries_z == "periodic"
                   else "clamp"))
        return tuple((a * self.aux.invvol[:, None, :]).to_numpy()
                     for a in (rho, Jr, Jt, Jz))

    def set_moving_window(self, v=None, gamma_boost=None):
        """Attach a moving window of speed v (default c) to the simulation.

        Requires open z boundaries (reference: main.py:1004-1033).
        """
        if self.config.boundaries_z != "open":
            raise ValueError(
                "A moving window requires boundaries={'z': 'open'}.")
        if v is None:
            v = c
        if gamma_boost is not None and self.boost is not None:
            v, = self.boost.velocity([v])
        self.moving_win = float(v)
        self.state = dataclasses.replace(
            self.state, mw_zref=jnp.asarray(self.zmin,
                                            dtype=self.state.zmin.dtype))
        self._step_fns.clear()

    def get_rmax_gather(self):
        """Radius beyond which particles no longer gather fields
        (excludes the radial PML cells; reference:
        boundary_communicator.py get_rmax)."""
        if self.config.use_pml:
            return self.config.rmax - self.config.nr_damp * self.config.dr
        return self.config.rmax

    def reverse_time(self):
        """Reverse the propagation direction of waves and particles by
        flipping the magnetic fields and the particle momenta
        (reference: main.py:1034-1054)."""
        st = self.state
        spect = dataclasses.replace(
            st.spect, Bp=-st.spect.Bp, Bm=-st.spect.Bm, Bz=-st.spect.Bz)
        interp = dataclasses.replace(
            st.interp, Br=-st.interp.Br, Bt=-st.interp.Bt, Bz=-st.interp.Bz)
        if self.config.use_pml:
            spect = dataclasses.replace(
                spect, Bp_pml=-spect.Bp_pml, Bm_pml=-spect.Bm_pml)
            interp = dataclasses.replace(
                interp, Br_pml=-interp.Br_pml, Bt_pml=-interp.Bt_pml)
        species = tuple(
            dataclasses.replace(sp, ux=-sp.ux, uy=-sp.uy, uz=-sp.uz)
            for sp in st.species)
        self.state = dataclasses.replace(st, spect=spect, interp=interp,
                                         species=species)

    def step(self, N=1, correct_currents=True, correct_divE=False,
             use_true_rho=False, move_positions=True, move_momenta=True,
             show_progress=False, reuse_rho_prev=True):
        """Perform N PIC cycles."""
        if not self._banner_printed:
            self._banner_printed = True
            from ..utils.printing import print_simulation_setup
            print_simulation_setup(self, self.verbose_level)
        from ..utils.device import catch_memory_error
        return catch_memory_error(self._step_impl)(
            N, correct_currents=correct_currents, correct_divE=correct_divE,
            use_true_rho=use_true_rho, move_positions=move_positions,
            move_momenta=move_momenta, show_progress=show_progress,
            reuse_rho_prev=reuse_rho_prev)

    def build_options(self, correct_currents=True, correct_divE=False,
                      use_true_rho=False, move_positions=True,
                      move_momenta=True, reuse_rho_prev=True):
        """StepOptions for this simulation's configuration (shared by
        the single-chip step loop and the multi-chip distribution)."""
        mw_v = self.moving_win
        injectors = ()
        if mw_v is not None:
            injectors = tuple(self._injector_configs)
        return StepOptions(
            correct_currents=correct_currents,
            correct_divE=correct_divE,
            use_true_rho=use_true_rho,
            move_positions=move_positions,
            move_momenta=move_momenta,
            filter_currents=self.filter_currents,
            rmax_gather=self.get_rmax_gather(),
            moving_window_v=mw_v,
            injectors=injectors,
            external_fields=tuple(self.external_fields),
            mirrors=tuple(self.mirrors),
            n_antennas=len(self.laser_antennas),
            exchange_period=self.exchange_period,
            reuse_rho_prev=reuse_rho_prev,
            fused_deposit=self.use_fused_deposit,
        )

    def _step_impl(self, N=1, correct_currents=True, correct_divE=False,
                   use_true_rho=False, move_positions=True, move_momenta=True,
                   show_progress=False, reuse_rho_prev=True):
        mw_v = self.moving_win
        inj_auxes = ()
        if mw_v is not None:
            inj_auxes = tuple(self._injector_auxes)
        options = self.build_options(
            correct_currents=correct_currents, correct_divE=correct_divE,
            use_true_rho=use_true_rho, move_positions=move_positions,
            move_momenta=move_momenta, reuse_rho_prev=reuse_rho_prev)
        step_fn, prepare_fn = self._get_step_fn(options)
        ion_auxes = tuple(self._ionizer_auxes)
        comp_auxes = tuple(self._compton_auxes)

        # Refresh spectral E/B from the interpolation grid (captures any
        # user-set fields), then the initial rho_prev deposit
        # (reference: main.py:408-415 and :435-449)
        self.state = prepare_fn(self.state, self.aux, inj_auxes, ion_auxes,
                                (), comp_auxes)

        for diag in self.diags:
            diag.write(self)

        # Run in device-resident chunks: between chunks the host only
        # stops at diagnostic boundaries (minimizes host<->device syncs).
        done = 0
        it = self.iteration  # one host read; tracked host-side below
        writers = list(self.diags) + list(self.checkpoints)
        # Back-transformed diagnostics extract their plane slices
        # INSIDE the jitted chunk (device capture) so they do not force
        # 1-step chunks + per-step host syncs
        capture_writers = [w for w in writers
                           if hasattr(w, "device_capture")]
        plain_writers = [w for w in writers
                         if not hasattr(w, "device_capture")]
        capture_step = None
        if capture_writers:
            cap_fns = tuple(w.device_capture() for w in capture_writers)
            key = (options, tuple(id(w) for w in capture_writers))
            if key not in self._step_fns:
                from .step import make_multi_step_capture
                self._step_fns[key] = (make_multi_step_capture(
                    self.config, tuple(self.species_configs), options,
                    cap_fns), None)
            capture_step = self._step_fns[key][0]
        progress = None
        if show_progress:
            from ..utils.printing import ProgressBar
            progress = ProgressBar(N)
        # Cap the steps per device execution: a single XLA program
        # running for many minutes can trip device/RPC watchdogs
        # (observed on TPU v5e at ~300 s); 250 steps keeps executions
        # well under that while still amortizing dispatch.
        import os as _os
        max_chunk = int(_os.environ.get("FBPIC_TPU_MAX_CHUNK", "250"))
        while done < N:
            chunk = min(N - done, max_chunk)
            if plain_writers:
                period = min(getattr(d, "period", N)
                             for d in plain_writers)
                next_boundary = period - (it % period)
                chunk = min(chunk, max(1, next_boundary))
            antenna_series = ()
            if self.laser_antennas:
                import dataclasses as _dc
                series_list = []
                for antenna in self.laser_antennas:
                    series = antenna.compute_series(
                        it * self.dt, chunk, self.config.dz)
                    series = _dc.replace(
                        series, it0=jnp.asarray(it, jnp.int32))
                    series_list.append(series)
                antenna_series = tuple(series_list)
            if capture_step is not None:
                self.state, caps = capture_step(
                    self.state, self.aux, chunk, inj_auxes, ion_auxes,
                    antenna_series, comp_auxes)
            else:
                self.state = step_fn(self.state, self.aux, chunk,
                                     inj_auxes, ion_auxes,
                                     antenna_series, comp_auxes)
            done += chunk
            it += chunk
            if progress is not None:
                jax.block_until_ready(self.state)
                progress.time(done)
                progress.print_progress()
            if capture_step is not None:
                for w, cap in zip(capture_writers, caps):
                    w.process_chunk(self, cap)
            for writer in plain_writers:
                writer.write(self)
        # Block so that wall-clock timing by callers is meaningful
        jax.block_until_ready(self.state)
        if progress is not None:
            progress.print_summary()
        self._consume_overflow_counters()

    def _ensure_capacity(self, index, min_capacity, factor=1.0):
        """Grow species ``index``'s arrays to at least ``min_capacity``
        (lane-rounded) with dead slots -- the analog of the reference's
        unbounded array growth.  Resident species are excluded: their
        capacity is tied to Nz * sort_K (grown via the sort_K bump)."""
        from ..particles.state import pad_particle_state
        sc = self.species_configs[index]
        sp = self.state.species[index]
        new_cap = int(-(-max(min_capacity, int(factor * sp.capacity))
                        // 128) * 128)
        if sc.resident or new_cap <= sp.capacity:
            return None
        species = list(self.state.species)
        species[index] = pad_particle_state(sp, new_cap)
        self.state = dataclasses.replace(self.state,
                                         species=tuple(species))
        self._step_fns.clear()
        return new_cap

    def _consume_overflow_counters(self):
        """Check the IN-JIT overflow counters (one batched host read
        per step() call -- each host<->device round trip costs tens of
        ms on tunneled backends).

        sort_overflow > 0: some z column exceeded the sorted-deposit
        capacity K during the chunk and its excess particles' charge
        was dropped.  The run is warned and sort_K is auto-bumped
        (1.5x, lane-rounded) so subsequent chunks recompile with
        enough headroom -- the analog of the reference GPU sort's
        unbounded reallocation.

        ring_overwrite > 0: continuous injection clobbered live
        in-range particles (fixed-capacity ring full; the reference
        grows its arrays without bound, particles/particles.py)."""
        state = self.state
        if state.sort_overflow is None and state.ring_overwrite is None:
            return
        n_sort, n_ring = jax.device_get(
            (state.sort_overflow, state.ring_overwrite))
        if n_sort is not None and int(n_sort) > 0:
            from ..particles.state import pad_particle_state
            bumped = []
            new_species = list(self.state.species)
            for i, sc in enumerate(self.species_configs):
                if sc.sort_K <= 0:
                    continue
                new_K = int(-(-3 * sc.sort_K // 2 // 128) * 128)
                self.species_configs[i] = dataclasses.replace(
                    sc, sort_K=new_K)
                if sc.resident:
                    # Residency requires capacity == Nz * sort_K:
                    # reallocate the arrays with dead-slot padding so
                    # the bumped K keeps the invariant instead of
                    # crashing the next chunk on the step's assert.
                    # Row-aware: the stored order is the (Nz, K_old)
                    # layout (positional between lazy re-sorts), so
                    # each ROW gets its dead tail.
                    new_species[i] = pad_particle_state(
                        new_species[i], self.config.Nz * new_K,
                        row_shape=(self.config.Nz, sc.sort_K))
                bumped.append(f"{sc.name}: {sc.sort_K}->{new_K}")
            self.state = dataclasses.replace(
                self.state, species=tuple(new_species))
            self._step_fns.clear()
            warnings.warn(
                f"{int(n_sort)} particle-step(s) exceeded a z column's "
                f"sorted-deposit capacity during this chunk (their "
                f"charge was dropped); sort_K auto-bumped "
                f"({'; '.join(bumped)}) for subsequent steps.  Pass a "
                f"larger sort_K to add_new_species to avoid the "
                f"recompile.", RuntimeWarning)
        if n_ring is not None and int(n_ring) > 0:
            # Auto-grow the ring-append species that are close to full
            # (the counter is global, so fill fraction identifies the
            # culprit) -- the analog of the reference's unbounded array
            # growth.  Subsequent chunks recompile with the new
            # capacity; the overflowing step's particles are lost
            # (warned), exactly like the sort_K bump above.
            grown = []
            for i, sc in enumerate(self.species_configs):
                sp = self.state.species[i]
                if sc.resident or not self.ptcl[i]._can_grow:
                    continue
                n_live = int(jax.device_get(jnp.sum(sp.w != 0)))
                if n_live > 0.5 * sp.capacity:
                    new_cap = self._ensure_capacity(i, 0, factor=2.0)
                    if new_cap:
                        grown.append(f"{sc.name}: -> {new_cap}")
            warnings.warn(
                f"{int(n_ring)} created/injected particle(s) found "
                "their species' ring buffer full this chunk (they were "
                "dropped or overwrote live particles)"
                + (f"; capacity auto-grown ({'; '.join(grown)}) for "
                   f"subsequent steps" if grown else "")
                + ".  Pass a larger `capacity` to add_new_species to "
                "avoid the recompile.", RuntimeWarning)
        if (n_sort is not None and int(n_sort) > 0) or (
                n_ring is not None and int(n_ring) > 0):
            # DISTINCT zero buffers: aliasing one array into two state
            # leaves makes the next donating jit call fail with
            # "Attempt to donate the same buffer twice"
            self.state = dataclasses.replace(
                self.state,
                sort_overflow=(None if n_sort is None
                               else jnp.zeros((), jnp.int32)),
                ring_overwrite=(None if n_ring is None
                                else jnp.zeros((), jnp.int32)))
