"""Multi-chip z-domain decomposition (shard_map over a 1-D mesh).

The PIC analog of sequence parallelism: the z axis is sliced into slabs,
one per device.  Each device runs the full local spectral solve on its
slab extended by n_guard cells at each end; the finite-order stencil
keeps the spectral operator local so the wrap-around error stays inside
the guards (SURVEY.md section 5 / reference parallelisation.rst:78-130).

Per step, over ICI (lax.ppermute):
  - E/B guard cells REPLACED from the neighbor interior (in
    partial-interpolation space, fused with the damping pass)
  - corrected J guard strips ADDED into the neighbor interior
  - particles crossing the slab boundary migrate via fixed-capacity
    buffers with validity masks

Layout (reference boundary_communicator.py:556-620):
    local grid = [ng | nc | interior | nc | ng], ng = nc = n_guard
    consecutive local grids overlap by 2*n_guard cells.
"""
import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields.solver import GridConfig
from ..fields import transform as tr
from ..core.state import SimState
from ..particles.compaction import topk_compact
from ..core import step as step_mod
from ..core.step import StepOptions


MIGRATION_FIELDS = ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w")


def local_grid_config(config_global: GridConfig, n_devices: int,
                      n_guard: int) -> GridConfig:
    """GridConfig of one device's slab (interior + 2*n_guard cells).

    config_global.Nz must be divisible by n_devices.
    """
    if config_global.Nz % n_devices != 0:
        raise ValueError("Nz must be divisible by the number of devices")
    Nz_int = config_global.Nz // n_devices
    # The local slab never wraps particles periodically and never folds
    # deposits around its own edges: it behaves like an 'open' local box
    # whose boundary handling is replaced by the halo exchange.
    return dataclasses.replace(
        config_global, Nz=Nz_int + 2 * n_guard, n_guard=n_guard,
        boundaries_z="open", nz_damp=0, n_inject=0,
    )


def exchange_guards_replace(fields, g, axis_name):
    """Replace z-guard cells from the neighbors' interiors.

    fields: list of CArr (Nm, Nzl, Nr).  The strip my neighbor needs is
    my 'nc' region; my guards are overwritten by what I receive.
    """
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]

    def one(F):
        Nzl = F.shape[1]
        # my right 'nc' -> right neighbor's left guard
        to_right_re = F.re[:, Nzl - 2 * g:Nzl - g]
        to_right_im = F.im[:, Nzl - 2 * g:Nzl - g]
        # my left 'nc' -> left neighbor's right guard
        to_left_re = F.re[:, g:2 * g]
        to_left_im = F.im[:, g:2 * g]
        from_left_re = jax.lax.ppermute(to_right_re, axis_name, fwd)
        from_left_im = jax.lax.ppermute(to_right_im, axis_name, fwd)
        from_right_re = jax.lax.ppermute(to_left_re, axis_name, bwd)
        from_right_im = jax.lax.ppermute(to_left_im, axis_name, bwd)
        re = F.re.at[:, :g].set(from_left_re)
        re = re.at[:, Nzl - g:].set(from_right_re)
        im = F.im.at[:, :g].set(from_left_im)
        im = im.at[:, Nzl - g:].set(from_right_im)
        return type(F)(re, im)

    return [one(F) for F in fields]


def exchange_guards_add(fields, g, axis_name):
    """Add 2g-wide edge strips into the neighbors' matching region."""
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]

    def one(F):
        Nzl = F.shape[1]
        send_right_re = F.re[:, Nzl - 2 * g:]
        send_right_im = F.im[:, Nzl - 2 * g:]
        send_left_re = F.re[:, :2 * g]
        send_left_im = F.im[:, :2 * g]
        from_left_re = jax.lax.ppermute(send_right_re, axis_name, fwd)
        from_left_im = jax.lax.ppermute(send_right_im, axis_name, fwd)
        from_right_re = jax.lax.ppermute(send_left_re, axis_name, bwd)
        from_right_im = jax.lax.ppermute(send_left_im, axis_name, bwd)
        re = F.re.at[:, :2 * g].add(from_left_re)
        re = re.at[:, Nzl - 2 * g:].add(from_right_re)
        im = F.im.at[:, :2 * g].add(from_left_im)
        im = im.at[:, Nzl - 2 * g:].add(from_right_im)
        return type(F)(re, im)

    return [one(F) for F in fields]


def migrate_particles(sp, config_local, zmin, axis_name, buffer_size,
                      global_open=False):
    """Move particles that crossed the slab ownership boundary.

    Ownership: [zmin + g dz, zmin + (Nzl - g) dz).  Outgoing particles
    are compacted into fixed-size buffers (validity by weight) and sent
    around the ring with ppermute; incoming particles are appended at
    the ring cursor (or over dead slots).  All per-particle fields that
    exist on the species (including ionization_level and tracking ids)
    migrate together.

    Returns (new_sp, n_lost): n_lost counts particles dropped because a
    buffer overflowed (int32 scalar, this rank only).

    global_open: the GLOBAL box has open z boundaries -- the edge ranks
    kill outward-leaving particles instead of wrapping them around the
    ring (they are outside the global box; reference removes them in
    remove_particles, particle_buffer_handling.py:40-100).
    """
    g = config_local.n_guard
    dz = config_local.dz
    Nzl = config_local.Nz
    z_lo = zmin + g * dz
    z_hi = zmin + (Nzl - g) * dz

    fields = list(MIGRATION_FIELDS)
    for name in ("ionization_level", "ids", "ids_hi",
                 "comp_x", "comp_y", "comp_z"):
        if getattr(sp, name) is not None:
            fields.append(name)

    alive = sp.w != 0
    go_left = alive & (sp.z < z_lo)
    go_right = alive & (sp.z >= z_hi)

    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]

    kill = jnp.zeros_like(go_left)
    if global_open:
        # Edge ranks: outward-leaving particles exit the global box
        kill_left = go_left & (me == 0)
        kill_right = go_right & (me == n - 1)
        kill = kill_left | kill_right
        go_left = go_left & ~kill_left
        go_right = go_right & ~kill_right

    def compact(mask):
        # top_k compaction, not per-channel scatters (compaction.py)
        bufs, n_sel, n_taken = topk_compact(
            mask, buffer_size, {f: getattr(sp, f) for f in fields})
        return bufs, (n_sel - n_taken).astype(jnp.int32)

    left_buf, lost_l = compact(go_left)
    right_buf, lost_r = compact(go_right)
    n_lost = lost_l + lost_r

    # Local arrays: mark outgoing (and globally-exiting) as dead
    out_mask = go_left | go_right | kill
    sp = dataclasses.replace(sp, w=jnp.where(out_mask, 0.0, sp.w))

    # Ship: my right-going buffer -> right neighbor; left-going -> left
    from_left = {k: jax.lax.ppermute(v, axis_name, fwd)
                 for k, v in right_buf.items()}
    from_right = {k: jax.lax.ppermute(v, axis_name, bwd)
                  for k, v in left_buf.items()}

    # The global-boundary wrap: for periodic global z, ppermute's ring
    # already wraps; positions must be shifted by the global box length
    # for particles that wrapped around.  (Never happens when
    # global_open: the edge ranks killed outward-leaving particles.)
    if not global_open:
        Lz_global = (Nzl - 2 * g) * dz * n
        wrapped_from_left = (me == 0)
        wrapped_from_right = (me == n - 1)
        from_left["z"] = jnp.where(
            wrapped_from_left & (from_left["w"] != 0),
            from_left["z"] - Lz_global, from_left["z"])
        from_right["z"] = jnp.where(
            wrapped_from_right & (from_right["w"] != 0),
            from_right["z"] + Lz_global, from_right["z"])

    # Append the received particles over dead slots.  Each received
    # buffer is front-packed on its own; COMPACT their concatenation
    # before any length clamp, so live entries from the right buffer
    # are never discarded by the truncation (round-2 bug: truncating
    # the raw concatenation dropped every left-migrating particle
    # whenever per-rank capacity < 2*buffer_size).
    incoming = {k: jnp.concatenate([from_left[k], from_right[k]])
                for k in fields}
    capacity = sp.w.shape[0]
    n_in = min(2 * buffer_size, capacity)
    packed, n_live_in, _ = topk_compact(incoming["w"] != 0, n_in,
                                        incoming)

    # Write compacted arrivals into genuinely dead slots only.  Dead
    # slots come first in dead_order, so arrival i lands in
    # dead_order[i] and the write is safe iff i < n_dead.  Arrivals
    # beyond the dead-slot count (or beyond n_in) are counted as lost
    # -- a live resident particle is never silently overwritten.
    dead_order = jnp.argsort(sp.w != 0)    # dead slots first
    n_dead = jnp.sum(sp.w == 0)
    slots = dead_order[:n_in]
    valid = (packed["w"] != 0) & (jnp.arange(n_in) < n_dead)
    n_lost = n_lost + (n_live_in
                       - jnp.sum(valid)).astype(jnp.int32)
    updates = {}
    for name in fields:
        arr = getattr(sp, name)
        old = arr[slots]
        new = jnp.where(valid, packed[name], old)
        updates[name] = arr.at[slots].set(new)
    return dataclasses.replace(sp, **updates), n_lost


def make_multichip_step(config_global: GridConfig, species_configs,
                        options: StepOptions, mesh: Mesh,
                        axis_name="z", migration_buffer=None,
                        n_guard=None, capture_fns=()):
    """Build the shard_map'd multi-device N-step function.

    config_global: the full-box grid config (periodic or open z; for
    open boundaries its Nz already includes the edge guard/damp/inject
    regions, exactly as in the single-chip Simulation).  Each rank owns
    Nz/ndev interior cells plus 2*n_guard halo cells; n_guard defaults
    to the finite-order stencil reach + 1 (reference:
    boundary_communicator.py:240-250).

    Moving window / continuous injection / open-z damping work on the
    decomposed grid: the damping profile is the global one sliced per
    rank, removal thresholds and the injection plane are global, and
    only the last rank writes injected particles (the replicated ring
    bookkeeping advances on every rank).

    state arrays are globally shaped: fields (Nm, ndev*Nzl, Nr) sharded
    along z; particle arrays (ndev*cap,) sharded.  aux is replicated
    (built from the LOCAL grid config -- use local_aux()).

    capture_fns: tuple of cap(state_local, aux) -> small REPLICATED
    pytree (the capture must psum over `axis_name` itself), evaluated
    after every step inside the device program and stacked over steps
    -- the decomposed analog of core.step.make_multi_step_capture,
    used by the back-transformed diagnostics.  When non-empty,
    multi_step returns (state, caps).

    Returns (multi_step, config_local).
    multi_step(state, aux, n_steps, inj_auxes=(), ion_auxes=(),
               antenna_series=(), comp_auxes=()).
    """
    ndev = mesh.devices.size
    if n_guard is None:
        from ..fields.stencil import get_stencil_reach
        from ..constants import c as c_light
        if config_global.n_order == -1:
            raise ValueError(
                "Multi-chip decomposition needs a finite stencil order "
                "(n_order > 0), like the reference's MPI mode.")
        n_guard = get_stencil_reach(
            config_global.Nz, config_global.dz,
            c_light * config_global.dt, config_global.n_order,
            config_global.v_comoving, config_global.use_galilean) + 1
    g = int(n_guard)
    config_local = local_grid_config(config_global, ndev, g)
    Nz_int = config_local.Nz - 2 * g
    dz = config_local.dz
    global_open = config_global.boundaries_z == "open"

    # Particle exchange cadence: between migrations particles may stray
    # up to exchange_period * 2*c*dt into the halo; cap it so they stay
    # within half the guard region (reference's auto exchange_period,
    # boundary_communicator.py:280-304).
    from ..constants import c as _c
    cells_per_step = 2.0 * _c * config_global.dt / dz
    max_period = max(1, int((g / 2 - 3) / cells_per_step))
    exchange_period = max(1, min(int(options.exchange_period),
                                 max_period))
    options = dataclasses.replace(options,
                                  exchange_period=exchange_period)

    if migration_buffer is None:
        # Particles within exchange_period * 2*c*dt of a boundary can
        # cross before the next exchange: ~2*(E+1) columns' worth
        # (column occupancy ~ sort_K when the sorted path is active).
        occ = max((sc.sort_K for sc in species_configs), default=0)
        migration_buffer = max(2048,
                               (exchange_period + 1) * max(occ, 256))

    # Global damping profile, padded by g zero cells at each end so a
    # rank's halo cells beyond the global box are damped to zero (they
    # receive ring-wrapped garbage after the moving-window shift).
    damp_padded = None
    if global_open and config_global.nz_damp > 0:
        from ..fields.solver import _damp_profile_z
        prof = _damp_profile_z(config_global)
        damp_padded = jnp.asarray(
            np.pad(prof, g, mode="constant"), jnp.float64
            if jax.config.jax_enable_x64 else jnp.float32)

    _axis = axis_name

    class Halo:
        """Exchange + global-geometry hooks for the decomposed step."""

        axis_name = _axis

        def exchange_add(self, fields):
            return exchange_guards_add(fields, g, axis_name)

        def exchange_replace(self, fields):
            return exchange_guards_replace(fields, g, axis_name)

        def global_zmin(self, zmin_local):
            idx = jax.lax.axis_index(axis_name)
            return zmin_local - (idx * Nz_int - g) * dz

        def removal_bounds(self, zmin_g):
            if not global_open:
                inf = jnp.asarray(np.inf, zmin_g.dtype)
                return (-inf, inf)
            ng = max(config_global.n_guard, 1)
            return (zmin_g + ng * dz,
                    zmin_g + (config_global.Nz - ng) * dz)

        def grid_globals(self, zmin_g):
            return (zmin_g, config_global.Nz, config_global.n_guard,
                    config_global.n_inject)

        def is_last(self):
            return jax.lax.axis_index(axis_name) == ndev - 1

        def own_bounds(self, zmin_local):
            return (zmin_local + g * dz,
                    zmin_local + (config_local.Nz - g) * dz)

        def ownership_bounds(self, zmin_local):
            """Half-open z interval of particles THIS rank owns, with
            the global edges opened to +-inf (slabs tile the global
            box, so every position belongs to exactly one rank).  Used
            to route injected particles to the rank that owns their
            position: the injection plane generally does NOT lie on
            the last rank (the z grid carries damp/guard padding, so
            the last slab may hold only padding), and writing new
            particles on a non-owning rank leaves their deposits
            clamped into wrong guard rows until the next migration."""
            idx = jax.lax.axis_index(axis_name)
            lo, hi = self.own_bounds(zmin_local)
            inf = jnp.asarray(np.inf, lo.dtype)
            lo = jnp.where(idx == 0, -inf, lo)
            hi = jnp.where(idx == ndev - 1, inf, hi)
            return lo, hi

        def damp_profile(self):
            if damp_padded is None:
                return None
            idx = jax.lax.axis_index(axis_name)
            return jax.lax.dynamic_slice(
                damp_padded, (idx * Nz_int,), (config_local.Nz,))

    base_step = step_mod.make_step_fn(config_local, species_configs,
                                      options, halo=Halo())

    def local_step(state: SimState, aux, inj_auxes, ion_auxes,
                   antenna_series, comp_auxes):
        # This device's slab position: state.zmin is the GLOBAL left edge
        idx = jax.lax.axis_index(axis_name)
        zmin_global = state.zmin
        zmin_local = zmin_global + (idx * Nz_int - g) * dz

        # 1. Particle migration across slab boundaries, every
        #    exchange_period steps (the same cadence as removal /
        #    injection / fresh rho_prev deposits in the base step;
        #    reference: main.py:435-454).  The guard clamp above
        #    guarantees strays stay inside the halo between exchanges.
        def _migrate(species_in):
            species = []
            n_lost = jnp.zeros((), jnp.int32)
            for sp in species_in:
                sp, lost = migrate_particles(sp, config_local, zmin_local,
                                             axis_name, migration_buffer,
                                             global_open=global_open)
                species.append(sp)
                n_lost = n_lost + lost
            return tuple(species), jax.lax.psum(n_lost, axis_name)

        if exchange_period <= 1:
            species, n_lost = _migrate(state.species)
        else:
            do_mig = (state.iteration % exchange_period) == 0
            species, n_lost = jax.lax.cond(
                do_mig, _migrate,
                lambda s: (s, jnp.zeros((), jnp.int32)),
                state.species)
        overflow = state.migration_overflow
        if overflow is None:
            overflow = jnp.zeros((), jnp.int32)
        overflow = overflow + n_lost
        state = dataclasses.replace(state, species=tuple(species),
                                    zmin=zmin_local,
                                    migration_overflow=overflow)

        # 2. Local PIC cycle (halo exchanges happen inside, at the
        #    reference's points in the cycle)
        state = base_step(state, aux, inj_auxes, ion_auxes,
                          antenna_series, comp_auxes)
        # Back to the global frame, keeping any moving-window shift
        # the step applied to the local edge
        shift = state.zmin - zmin_local
        return dataclasses.replace(state, zmin=zmin_global + shift)

    def state_specs(state):
        """PartitionSpec pytree: z axis of fields, particle axis sharded."""
        def spec_leaf(path, leaf):
            names = [getattr(p, "name", "") for p in path]
            if "species" in names:
                return P(axis_name) if leaf.ndim == 1 else P()
            if ("spect" in names or "interp" in names) and leaf.ndim == 3:
                return P(None, axis_name, None)
            return P()
        flat, treedef = jax.tree_util.tree_flatten_with_path(state)
        return jax.tree_util.tree_unflatten(
            treedef, [spec_leaf(p, l) for p, l in flat])

    def multi_step(state, aux, n_steps, inj_auxes=(), ion_auxes=(),
                   antenna_series=(), comp_auxes=()):
        state = step_mod.ensure_counters(state)
        if state.migration_overflow is None:
            state = dataclasses.replace(
                state, migration_overflow=jnp.zeros((), jnp.int32))
        specs = state_specs(state)
        rep = jax.tree_util.tree_map(lambda _: P(), (
            aux, inj_auxes, ion_auxes, antenna_series, comp_auxes))

        def body(state_local, aux_local, inj_l, ion_l, ant_l, comp_l):
            if state_local.migration_overflow is None:
                # Keep the fori_loop carry structure fixed
                state_local = dataclasses.replace(
                    state_local,
                    migration_overflow=jnp.zeros((), jnp.int32))
            if capture_fns:
                def one_cap(s, _):
                    s2 = local_step(s, aux_local, inj_l, ion_l, ant_l,
                                    comp_l)
                    caps = tuple(f(s2, aux_local) for f in capture_fns)
                    return s2, caps
                return jax.lax.scan(one_cap, state_local, None,
                                    length=n_steps)
            def one(i, s):
                return local_step(s, aux_local, inj_l, ion_l, ant_l,
                                  comp_l)
            return jax.lax.fori_loop(0, n_steps, one, state_local)

        if capture_fns:
            # caps are psum'd inside the captures -> replicated (P()
            # is a pytree PREFIX covering the whole caps subtree)
            sharded = shard_map(
                body, mesh=mesh, in_specs=(specs,) + rep,
                out_specs=(specs, P()), check_vma=False)
        else:
            sharded = shard_map(
                body, mesh=mesh, in_specs=(specs,) + rep,
                out_specs=specs, check_vma=False)
        return sharded(state, aux, inj_auxes, ion_auxes, antenna_series,
                       comp_auxes)

    return multi_step, config_local


def local_aux(config_local: GridConfig, **kwargs):
    """Field aux for one slab (replicated across the mesh)."""
    from ..fields.solver import build_field_aux
    return build_field_aux(config_local, **kwargs)


def build_multichip_state(config_global: GridConfig, config_local,
                          n_devices, particles_by_species, zmin_global=0.0,
                          cap_local=None):
    """Assemble the sharded-format SimState for a z-decomposed run.

    particles_by_species: list of dicts with numpy arrays
    x,y,z,ux,uy,uz,inv_gamma,w (global).  Particles are binned into
    slabs by z and packed into per-device fixed-capacity blocks.
    """
    from ..fields.solver import SpectralFields, InterpFields
    from ..particles.state import ParticleState
    from ..utils.dtypes import real_dtype

    rdt = real_dtype()
    Nzl = config_local.Nz
    Nz_int = Nzl - 2 * config_local.n_guard
    Lz_int = Nz_int * config_local.dz

    cfg_concat = dataclasses.replace(config_local, Nz=n_devices * Nzl)
    spect = SpectralFields.zeros(cfg_concat)
    interp = InterpFields.zeros(cfg_concat)

    species = []
    for arrays in particles_by_species:
        z = arrays["z"]
        dev = np.clip(((z - zmin_global) // Lz_int).astype(int),
                      0, n_devices - 1)
        max_count = max(int((dev == i).sum()) for i in range(n_devices))
        cap = cap_local or int(-(-(int(1.3 * max_count) + 1) // 256) * 256)
        blocks = {k: np.zeros(n_devices * cap) for k in MIGRATION_FIELDS}
        blocks["inv_gamma"][:] = 1.0
        for i in range(n_devices):
            sel = dev == i
            cnt = int(sel.sum())
            for k in MIGRATION_FIELDS:
                blocks[k][i * cap:i * cap + cnt] = arrays[k][sel]
        species.append(ParticleState(
            **{k: jnp.asarray(v, rdt) for k, v in blocks.items()}))

    return SimState(
        spect=spect, interp=interp, species=tuple(species),
        time=jnp.asarray(0.0, rdt),
        zmin=jnp.asarray(float(zmin_global), rdt),
        iteration=jnp.asarray(0, jnp.int32),
        mw_zref=jnp.asarray(float(zmin_global), rdt),
        seed=jnp.asarray(0, jnp.uint32),
    )
