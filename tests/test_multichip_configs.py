"""Multi-chip coverage for PML, Galilean/boosted, Compton, cubic shapes.

The reference CI runs these configurations under MPI (radial PML on 2
ranks, /root/reference/tests/test_pml.py:11; the periodic plasma-wave /
boosted tests via mpirun, /root/reference/tests/test_periodic_plasma_wave.py:14-20);
here each runs decomposed over a 4-device mesh and is compared against
the single-chip run (parity) or checked on sharp counting invariants
(Compton appends).
"""
import numpy as np
import jax
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e

N_DEV = 4


def _needs_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs %d devices" % N_DEV)


def _ez(sim):
    from fbpic_tpu.fields import transform as tr
    return tr.spect2interp_scal(sim.aux.mats,
                                sim.state.spect.Ez).to_numpy()


def test_multichip_pml_parity():
    """Radial PML (split-field PSATD-PML) decomposed over z: the split
    components ride the same guard exchange as the regular fields
    (core/step.py), so a diffracting laser absorbed by the PML must
    match the single-chip run."""
    _needs_devices()
    from fbpic_tpu.parallel.api import distribute_simulation
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    Nz, Nr, Nm = 128, 24, 2
    zmax, rmax = 12.8e-6, 6.e-6
    dt = zmax / Nz / c

    def build():
        sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, n_order=16,
                         boundaries={"z": "periodic", "r": "open"},
                         n_damp={"z": 0, "r": 12},
                         random_seed=0, verbose_level=0)
        # Tightly focused: the diffraction cone reaches the PML
        add_laser_pulse(sim, GaussianLaser(a0=0.01, waist=1.5e-6,
                                           tau=5.e-15, z0=6.e-6))
        return sim

    N_STEPS = 120
    sim1 = build()
    sim1.step(N_STEPS, correct_currents=False, show_progress=False)
    Ez1 = _ez(sim1)

    sim4 = build()
    run = distribute_simulation(sim4, n_devices=N_DEV,
                                correct_currents=False)
    run.step(N_STEPS)
    Ez4 = run.get_interp_field("Ez", m=0)

    scale = np.abs(Ez1).max()
    assert scale > 0
    err = np.abs(Ez4 - Ez1[0]).max() / scale
    print("multichip PML max rel deviation:", err)
    # Vacuum + PML has no per-slab correction locality: the exchange is
    # parity-exact up to the local-DFT round trips
    assert err < 1e-6


def test_multichip_galilean_parity():
    """Galilean (comoving-frame) PSATD decomposed over z: the comoving
    phase advance and the Galilean coefficient set must reproduce the
    single-chip propagation of a deterministic signal (a laser pulse).

    A flowing-PLASMA parity check is not meaningful here: a uniform
    drifting neutral plasma has only discreteness-noise fields, so any
    two runs differ at O(1) relative -- the plasma-side NCI behavior is
    covered by test_multichip_galilean_nci below."""
    _needs_devices()
    from fbpic_tpu.parallel.api import distribute_simulation
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    Nz, Nr, Nm = 128, 24, 2
    zmax, rmax = 12.8e-6, 8.e-6
    dt = zmax / Nz / c

    def build():
        sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, n_order=16,
                         v_comoving=0.9999 * c, use_galilean=True,
                         random_seed=0, verbose_level=0)
        add_laser_pulse(sim, GaussianLaser(a0=0.01, waist=3.e-6,
                                           tau=6.e-15, z0=6.e-6))
        return sim

    N_STEPS = 80
    sim1 = build()
    sim1.step(N_STEPS, correct_currents=False, show_progress=False)
    Ez1 = _ez(sim1)

    sim4 = build()
    run = distribute_simulation(sim4, n_devices=N_DEV,
                                correct_currents=False)
    run.step(N_STEPS)
    Ez4 = run.get_interp_field("Ez", m=0)

    scale = np.abs(Ez1).max()
    assert scale > 0
    err = np.abs(Ez4 - Ez1[0]).max() / scale
    print("multichip Galilean max rel deviation:", err)
    assert err < 1e-6


def test_multichip_galilean_nci():
    """A gamma=130 flowing plasma stepped decomposed with the Galilean
    scheme must stay bounded.  Regression pin for the missing
    Galilean grid drift (round 4): without the per-step zmin advance
    the scheme degenerates to the static-grid comoving variant and
    this exact config EXPLODES by 13 orders of magnitude by step 360
    (measured: RMS 1.5e7 vs the correct 2e-6).  Full three-scheme NCI
    suppression is covered single-chip by test_boosted.py."""
    _needs_devices()
    from fbpic_tpu.parallel.api import distribute_simulation
    from fbpic_tpu.constants import m_e as me  # noqa: F401

    Nz, Nr, Nm = 64, 16, 2
    zmax, rmax = 7.86, 7.86
    zmin = -7.86
    dt = (zmax - zmin) / Nz / c
    gamma_boost = 130.
    uz_m = np.sqrt(gamma_boost**2 - 1)
    n_e = gamma_boost / (4 * np.pi * 2.81e-15)

    def growth(scheme, n_a, n_b):
        kw = {}
        if scheme == "galilean":
            kw = dict(v_comoving=0.9999 * c, use_galilean=True)
        sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                         zmin, zmax, 0., 0.9 * rmax, 2, 2, 4, n_e,
                         zmin=zmin, initialize_ions=True, n_order=16,
                         exchange_period=1, random_seed=0,
                         verbose_level=0, **kw)
        for view in sim.ptcl:
            view.uz = uz_m * np.ones(view.Ntot)
            view.inv_gamma = (1. / np.sqrt(1 + uz_m**2)
                              * np.ones(view.Ntot))
        run = distribute_simulation(sim, n_devices=N_DEV)

        def rms():
            Er0 = run.get_interp_field("Er", 0)
            Er1 = run.get_interp_field("Er", 1)
            return float(np.sqrt(np.average(
                np.abs(Er0)**2 + np.abs(Er1)**2)))

        run.step(n_a)
        a = rms()
        run.step(n_b - n_a)
        return a, rms()

    a_gal, b_gal = growth("galilean", 120, 360)
    print("Galilean E_r RMS: step 120 %.3e -> step 360 %.3e"
          % (a_gal, b_gal))
    # Healthy runs grow ~9x over this window (noise seeding); the
    # broken static-grid variant grows ~1e10x
    assert b_gal < 1e3 * a_gal


def test_multichip_compton_counts():
    """Compton scattering on the mesh: photon appends ride the
    replicated-cursor protocol, so photon macro-count must equal the
    number of scattered electrons and all tracking ids stay unique
    (the analog of the multichip ionization test)."""
    _needs_devices()
    from fbpic_tpu.parallel.api import distribute_simulation

    Nz, Nr, Nm = 64, 8, 1
    zmax, rmax = 6.4e-6, 2.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, n_order=16,
                     random_seed=5, verbose_level=0)
    elec = sim.add_new_species(q=-e, m=m_e, n=1e20, p_nz=2, p_nr=4,
                               p_nt=4, p_zmin=0, p_zmax=zmax, p_rmin=0,
                               p_rmax=1.5e-6, continuous_injection=False)
    photons = sim.add_new_species(q=0., m=0., capacity=65536,
                                  continuous_injection=False)
    elec.activate_compton(
        photons, laser_energy=1.0e6, laser_wavelength=0.8e-6,
        laser_waist=1.0e-3, laser_ctau=1.0e-2, laser_initial_z0=0.0)
    photons.track()

    run = distribute_simulation(sim, n_devices=N_DEV,
                                correct_currents=False)
    counts = []
    for _ in range(3):          # several chunks: cursor reuse
        run.step(4)
        pw = np.asarray(run.state.species[photons._index].w)
        counts.append(int((pw != 0).sum()))
    assert counts[0] > 0, "no scattering happened; raise laser_energy"
    assert counts[-1] > counts[0], counts

    psp = run.state.species[photons._index]
    live = np.asarray(psp.w) != 0
    ids = (np.asarray(psp.ids_hi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(psp.ids).astype(np.uint64)
    live_ids = ids[live]
    assert len(np.unique(live_ids)) == len(live_ids), \
        "duplicate photon tracking ids across ranks"


def test_multichip_cubic_parity():
    """Cubic particle shapes decomposed: the wider (4-cell) deposition
    footprint must stay inside the guard reach and match the
    single-chip run on the plasma-wave workload."""
    _needs_devices()
    from fbpic_tpu.parallel.api import distribute_simulation
    from fbpic_tpu.constants import m_e as me, epsilon_0

    Nz, Nr, Nm = 128, 16, 2
    zmax, rmax = 25.6e-6, 12.8e-6
    dt = zmax / Nz / c
    n_e = 2.e24
    w0 = 5.e-6
    eps = 1e-3
    k0 = 2 * np.pi / zmax
    wp = np.sqrt(n_e * e**2 / (me * epsilon_0))

    def build():
        sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                         0., zmax, 0., 0.9 * rmax, 2, 2, 4, n_e,
                         n_order=16, particle_shape="cubic",
                         exchange_period=1,
                         random_seed=0, verbose_level=0)
        view = sim.ptcl[0]
        x = np.asarray(view.x); y = np.asarray(view.y)
        z = np.asarray(view.z)
        r2 = x**2 + y**2
        env = np.exp(-r2 / w0**2)
        view.ux = eps * c / wp * 2 * x / w0**2 * env * np.sin(k0 * z)
        view.uy = eps * c / wp * 2 * y / w0**2 * env * np.sin(k0 * z)
        view.uz = -eps * c / wp * k0 * env * np.cos(k0 * z)
        ux = np.asarray(view.ux); uy = np.asarray(view.uy)
        uz = np.asarray(view.uz)
        view.inv_gamma = 1. / np.sqrt(1 + ux**2 + uy**2 + uz**2)
        return sim

    N_STEPS = 30
    sim1 = build()
    sim1.step(N_STEPS, show_progress=False)
    Ez1 = _ez(sim1)

    sim4 = build()
    run = distribute_simulation(sim4, n_devices=N_DEV)
    run.step(N_STEPS)
    Ez4 = run.get_interp_field("Ez", m=0)

    scale = np.abs(Ez1).max()
    assert scale > 0
    err = np.abs(Ez4 - Ez1[0]).max() / scale
    print("multichip cubic max rel deviation:", err)
    assert err < 5e-3
