"""Multi-chip z-domain decomposition: parity vs single-device.

Runs the periodic plasma-wave workload decomposed over 4 virtual
devices (shard_map + ppermute halo exchange) and compares the fields
against the single-device run -- the analog of the reference's
2-rank-mpirun variant of test_periodic_plasma_wave.py.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fbpic_tpu.constants import c, e, m_e, epsilon_0
from fbpic_tpu.fields.solver import (
    GridConfig, build_field_aux, SpectralFields, InterpFields,
)
from fbpic_tpu.core.state import SimState
from fbpic_tpu.core.step import StepOptions, make_multi_step, make_prepare
from fbpic_tpu.particles.state import (
    generate_evenly_spaced, make_particle_state, SpeciesConfig,
)
from fbpic_tpu.parallel.mesh import make_mesh
from fbpic_tpu.parallel import domain as dom

# Small periodic plasma-wave setup
Nz, Nr, Nm = 128, 16, 2
zmax = 25.6e-6
rmax = 12.8e-6
n_order = 16
dt = zmax / Nz / c
n_e = 2.e24
w0 = 5.e-6
eps = 1e-3
k0 = 2 * np.pi / zmax
wp = np.sqrt(n_e * e**2 / (m_e * epsilon_0))
N_STEP = 30
N_DEV = 4


def _make_particles():
    rng = np.random.RandomState(0)
    Ntot, x, y, z, ux, uy, uz, ig, w = generate_evenly_spaced(
        Nz, 0., zmax, Nr, 0., 0.9 * rmax, 4, n_e, None, rng=rng)
    r = np.sqrt(x**2 + y**2)
    env = np.exp(-r**2 / w0**2)
    ux = eps * c / wp * 2 * x / w0**2 * env * np.sin(k0 * z)
    uy = eps * c / wp * 2 * y / w0**2 * env * np.sin(k0 * z)
    uz = -eps * c / wp * k0 * env * np.cos(k0 * z)
    ig = 1. / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    return dict(x=x, y=y, z=z, ux=ux, uy=uy, uz=uz, inv_gamma=ig, w=w)


def test_multichip_parity_plasma_wave():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs %d devices" % N_DEV)

    parts = _make_particles()
    sc = SpeciesConfig(q=-e, m=m_e)
    options = StepOptions(rmax_gather=rmax)

    # ---------------- Single-device reference run
    config1 = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=zmax / Nz, dr=rmax / Nr,
                         rmax=rmax, dt=dt, n_order=n_order)
    aux1 = build_field_aux(config1)
    ps1 = make_particle_state(parts["x"], parts["y"], parts["z"],
                              parts["ux"], parts["uy"], parts["uz"],
                              parts["inv_gamma"], parts["w"])
    state1 = SimState(
        spect=SpectralFields.zeros(config1),
        interp=InterpFields.zeros(config1),
        species=(ps1,), time=jnp.asarray(0.0), zmin=jnp.asarray(0.0),
        iteration=jnp.asarray(0, jnp.int32), mw_zref=jnp.asarray(0.0))
    prep1 = make_prepare(config1, (sc,), options)
    state1 = prep1(state1, aux1)
    step1 = make_multi_step(config1, (sc,), options)
    state1 = jax.block_until_ready(step1(state1, aux1, N_STEP))
    from fbpic_tpu.fields import transform as tr
    Ez1 = tr.spect2interp_scal(aux1.mats, state1.spect.Ez).to_numpy()

    # ---------------- 4-device decomposed run
    n_guard = 24
    mesh = make_mesh(N_DEV, axis_name="z")
    mstep, config_loc = dom.make_multichip_step(
        config1, (sc,), options, mesh, axis_name="z",
        migration_buffer=1024, n_guard=n_guard)
    aux_loc = build_field_aux(config_loc)
    state4 = dom.build_multichip_state(config1, config_loc, N_DEV, [parts])
    state4 = jax.block_until_ready(
        jax.jit(mstep, static_argnums=2)(state4, aux_loc, N_STEP))

    # Extract the physical interiors of each slab and compare.
    # The global array stores concatenated local slabs; transform each
    # slab with the LOCAL inverse DFT + DHT (host numpy).
    Ez_s = state4.spect.Ez.to_numpy().reshape(Nm, N_DEV, config_loc.Nz, Nr)
    Wi = (np.asarray(aux_loc.mats.Wi_re)
          + 1j * np.asarray(aux_loc.mats.Wi_im))
    invM0 = np.asarray(aux_loc.mats.invM0)
    Ez4 = np.einsum("mdzr,mrs->mdzs", Ez_s, invM0)
    Ez4 = np.einsum("uz,mdzr->mdur", Wi, Ez4)
    Nzl = config_loc.Nz
    Nz_int = Nzl - 2 * n_guard
    Ez4_global = np.concatenate(
        [Ez4[:, i, n_guard:n_guard + Nz_int, :] for i in range(N_DEV)],
        axis=1)

    scale = np.abs(Ez1).max()
    err = np.abs(Ez4_global - Ez1).max() / scale
    print("multichip max rel deviation:", err)
    # Deposits/push/exchange are parity-exact (5e-9 with the correction
    # off); the residual deviation is the per-slab curl-free correction
    # (a global 1/k^2 operator applied per local box, as in the
    # reference's MPI decomposition).
    assert err < 5e-3


if __name__ == "__main__":
    test_multichip_parity_plasma_wave()


def test_multichip_lwfa_moving_window():
    """Production multi-chip path: open-z boundaries + moving window +
    continuous injection, decomposed over 4 devices via
    distribute_simulation, must match the single-chip run (the analog
    of the reference's 2-rank LWFA MPI tests).

    Both runs use exchange_period=1 so the injection/removal schedule
    (and its PRNG stream consumption) is identical.
    """
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs %d devices" % N_DEV)
    from fbpic_tpu import Simulation
    from fbpic_tpu.constants import m_e as me_, e as e_
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
    from fbpic_tpu.parallel.api import distribute_simulation
    from fbpic_tpu.fields import transform as tr2

    NZ_PHYS, NR, NM = 130, 20, 2
    ZMAX, ZMIN, RMAX = 12.e-6, -4.e-6, 10.e-6
    dz = (ZMAX - ZMIN) / NZ_PHYS
    dt_ = dz / c
    N_STEPS = 50

    def build():
        sim = Simulation(
            NZ_PHYS, ZMAX, NR, RMAX, NM, dt_,
            p_zmin=2.e-6, p_zmax=200.e-6, p_rmin=0., p_rmax=9.e-6,
            p_nz=1, p_nr=2, p_nt=4, n_e=5.e24, zmin=ZMIN,
            n_order=16, boundaries={"z": "open", "r": "reflective"},
            exchange_period=1, random_seed=0, verbose_level=0)
        add_laser_pulse(sim, GaussianLaser(a0=0.5, waist=4.e-6,
                                           tau=8.e-15, z0=6.e-6))
        sim.set_moving_window(v=c)
        return sim

    # Single-chip reference
    sim1 = build()
    sim1.step(N_STEPS, show_progress=False)
    Ez1 = tr2.spect2interp_scal(sim1.aux.mats,
                                sim1.state.spect.Ez).to_numpy()[0]

    # Distributed run (pad the internal grid to a multiple of N_DEV by
    # choice of parameters; check and skip if the internal Nz doesn't
    # divide -- the constructor controls it via Nz + edge cells)
    sim4 = build()
    if sim4.config.Nz % N_DEV != 0:
        pytest.skip("internal Nz=%d not divisible by %d"
                    % (sim4.config.Nz, N_DEV))
    run = distribute_simulation(sim4, n_devices=N_DEV)
    run.step(N_STEPS)
    Ez4 = run.get_interp_field("Ez", m=0)

    scale = np.abs(Ez1).max()
    err = np.abs(Ez4 - Ez1).max() / scale
    print("multichip LWFA max rel deviation:", err)
    assert scale > 0
    # Deviation is the per-slab current-correction locality (~1e-3 at
    # 50 steps); everything else is parity-exact (vacuum window run:
    # 5e-13)
    assert err < 5e-3
