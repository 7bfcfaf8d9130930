"""openPMD diagnostics + checkpoint/restart tests.

Checks the openPMD layout (mode stacking, attributes) and that a
restart reproduces the simulation state bit-exactly -- the counterpart
of the restart check in
/root/reference/tests/test_example_docs_scripts.py:25-40.
"""
import os

import numpy as np
import h5py
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e
from fbpic_tpu.diagnostics import (
    FieldDiagnostic, ParticleDiagnostic, set_periodic_checkpoint,
    restart_from_checkpoint,
)

Nz, Nr, Nm = 64, 16, 2
zmax, rmax = 6.4e-6, 8.e-6
dt = zmax / Nz / c


def _make_sim(seed=0):
    return Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                      p_zmin=0., p_zmax=zmax, p_rmin=0., p_rmax=6.e-6,
                      p_nz=1, p_nr=1, p_nt=4, n_e=1.e24, random_seed=seed)


def test_field_and_particle_diag(tmp_path):
    sim = _make_sim()
    wdir = str(tmp_path / "diags")
    sim.diags.append(FieldDiagnostic(4, sim, write_dir=wdir))
    sim.diags.append(ParticleDiagnostic(
        4, species={"electrons": sim.ptcl[0]}, write_dir=wdir,
        select={"uz": [None, None]}, sim=sim))
    sim.step(4, show_progress=False)

    path = os.path.join(wdir, "hdf5", "data%08d.h5" % 4)
    assert os.path.exists(path)
    with h5py.File(path, "r") as f:
        assert f.attrs["openPMD"] == b"1.0.0"
        it = f["/data/4"]
        assert abs(it.attrs["time"] - 4 * dt) < 1e-20
        Ez = it["fields/E/z"]
        assert Ez.shape == (2 * Nm - 1, Nr, Nz)
        assert Ez.attrs["unitSI"] == 1.0
        E_rec = it["fields/E"]
        assert E_rec.attrs["geometry"] == b"thetaMode"
        rho = it["fields/rho"][...]
        # Uniform plasma: rho mode 0 ~ -e n_e in the interior
        # (first radial row excluded: p_nr=1 under-resolves the Ruyten
        # correction on axis)
        interior = rho[0, 1:8, 4:-4]
        assert np.allclose(interior, -e * 1e24, rtol=0.05)
        # Particles
        ptcl = it["particles/electrons"]
        x = ptcl["position/x"][...]
        w = ptcl["weighting"][...]
        n_live = int(np.sum(sim.ptcl[0].w != 0))
        assert len(x) == len(w) == n_live
        assert ptcl["charge"].attrs["value"] == -e


def test_checkpoint_restart(tmp_path):
    cdir = str(tmp_path / "checkpoints")
    sim = _make_sim()
    set_periodic_checkpoint(sim, 5, checkpoint_dir=cdir)
    sim.step(10, show_progress=False)
    Ez_10 = sim.get_interp_field("Ez")
    z_10 = sim.ptcl[0].z.copy()
    sim.step(5, show_progress=False)
    Ez_15 = sim.get_interp_field("Ez")

    # Restart a fresh simulation from the iteration-10 checkpoint
    sim2 = _make_sim(seed=1)  # different seed: state must be overwritten
    set_periodic_checkpoint(sim2, 5, checkpoint_dir=str(tmp_path / "c2"))
    restart_from_checkpoint(sim2, iteration=10, checkpoint_dir=cdir)
    assert sim2.iteration == 10
    np.testing.assert_array_equal(sim2.get_interp_field("Ez"), Ez_10)
    np.testing.assert_array_equal(sim2.ptcl[0].z, z_10)

    # Continue and check bit-exact agreement with the original run
    sim2.step(5, show_progress=False)
    np.testing.assert_allclose(sim2.get_interp_field("Ez"), Ez_15,
                               rtol=0, atol=0)


def test_particle_diag_EB_output(tmp_path):
    """Requested per-particle E/B must be gathered and written as
    openPMD records (reference particle_diag.py writes species.Ex..)."""
    sim = _make_sim()
    wdir = str(tmp_path / "diags_eb")
    sim.diags.append(ParticleDiagnostic(
        2, species={"electrons": sim.ptcl[0]}, write_dir=wdir,
        particle_data=("position", "momentum", "weighting", "E", "B"),
        sim=sim))
    # Put a known uniform Ez in the box so the gathered value is easy
    # to check (vacuum: fields stay ~constant over 2 steps)
    sim.step(2, show_progress=False)
    f = h5py.File(os.path.join(wdir, "hdf5", "data%08d.h5" % 2), "r")
    sp = f["/data/2/particles/electrons"]
    for rec in ("E", "B"):
        assert rec in sp, f"missing {rec} record"
        for comp in "xyz":
            assert comp in sp[rec]
        assert "unitDimension" in sp[rec].attrs
    n = sp["weighting"].shape[0]
    assert sp["E/x"].shape[0] == n
    f.close()


def test_btf_particle_diag_crossing_interpolation(tmp_path):
    """Lab-frame positions written by the BTF particle diagnostic must
    match the analytic ballistic trajectory to MUCH less than dz: the
    diagnostic advances each particle to the exact plane-crossing time
    t_cross before the inverse Lorentz transform (reference:
    boosted_particle_diag.py:812-826).  Without the interpolation the
    per-snapshot z smearing is O(c*dt) ~ dz."""
    from fbpic_tpu.diagnostics import BackTransformedParticleDiagnostic
    from fbpic_tpu.lpa_utils.bunch import add_particle_bunch_from_arrays
    from fbpic_tpu.constants import m_e

    gamma_b = 10.0
    beta_b = np.sqrt(1.0 - 1.0 / gamma_b**2)
    Nzl, Nrl, Nml = 64, 8, 1
    zmaxl, zminl, rmaxl = 20.e-6, -20.e-6, 16.e-6
    dzl = (zmaxl - zminl) / Nzl
    dtl = dzl / c
    sim = Simulation(Nzl, zmaxl, Nrl, rmaxl, Nml, dtl, zmin=zminl,
                     random_seed=0, verbose_level=0)
    # A few ballistic macro-particles (no plasma, negligible
    # self-field): boosted-frame initial conditions
    z0 = np.array([-4.e-6, -6.e-6, -8.e-6, -10.e-6])
    x0 = np.array([1.e-6, 2.e-6, 0.5e-6, 1.5e-6])
    y0 = np.zeros(4)
    ux = np.array([0.5, -0.3, 0.2, 0.0])
    uy = np.zeros(4)
    uz = np.array([0.3, 0.8, -0.2, 1.5])
    w = np.full(4, 1.0)
    add_particle_bunch_from_arrays(sim, -e, m_e, x0, y0, z0, ux, uy,
                                   uz, w, initialize_self_field=False)
    wdir = str(tmp_path / "btf_phys")
    diag = BackTransformedParticleDiagnostic(
        zmin_lab=-1.e-3, zmax_lab=1.e-3, v_lab=0.,
        dt_snapshots_lab=1.e-12, Ntot_snapshots_lab=1,
        gamma_boost=gamma_b, period=1, sim=sim,
        species={"bunch": sim.ptcl[-1]}, write_dir=wdir)
    sim.diags.append(diag)
    sim.step(40, show_progress=False)
    for i, snap in enumerate(diag.snapshots):
        if not snap["written"]:
            diag._flush(i, snap)
            snap["written"] = True

    # Analytic: boosted-frame worldline z(t) = z0 + vz*t crosses the
    # t_lab = 0 plane z_p(t) = -t*c/beta_b at
    # t* = -z0 / (vz + c/beta_b); the lab position of that event is
    # z_lab = gamma_b*(z(t*) + beta_b*c*t*), transverse unchanged.
    ig = 1.0 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    vz = uz * ig * c
    t_star = -z0 / (vz + c / beta_b)
    z_star = z0 + vz * t_star
    z_lab_exp = gamma_b * (z_star + beta_b * c * t_star)
    x_exp = x0 + ux * ig * c * t_star
    uz_lab_exp = gamma_b * (uz + beta_b / ig)

    with h5py.File(os.path.join(wdir, "hdf5", "particles%08d.h5" % 0),
                   "r") as f:
        sp = f["/data/0/particles/bunch"]
        z_w = np.asarray(sp["position/z"])
        x_w = np.asarray(sp["position/x"])
        uz_w = np.asarray(sp["momentum/z"]) / (m_e * c)
    assert len(z_w) == 4, f"caught {len(z_w)} of 4 particles"
    order_w, order_e = np.argsort(z_w), np.argsort(z_lab_exp)
    assert np.abs(z_w[order_w] - z_lab_exp[order_e]).max() < 1e-3 * dzl
    assert np.abs(x_w[order_w] - x_exp[order_e]).max() < 1e-3 * dzl
    assert np.abs(uz_w[order_w] / uz_lab_exp[order_e] - 1).max() < 1e-9


def test_btf_particle_diag_openpmd_layout(tmp_path):
    """Back-transformed particle snapshots must be openPMD records
    (position/momentum/weighting groups), not flat arrays
    (reference: boosted_particle_diag.py)."""
    from fbpic_tpu.diagnostics import BackTransformedParticleDiagnostic
    from fbpic_tpu.lpa_utils.boosted_frame import BoostConverter

    gamma_b = 5.0
    from fbpic_tpu.constants import m_e
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=0)
    elec = sim.add_new_species(q=-e, m=m_e, n=1.e24, p_nz=1, p_nr=1,
                               p_nt=4, p_zmin=0., p_zmax=zmax,
                               p_rmax=6.e-6, uz_m=10.0)
    wdir = str(tmp_path / "btf")
    diag = BackTransformedParticleDiagnostic(
        zmin_lab=0., zmax_lab=zmax, v_lab=0.,
        dt_snapshots_lab=3 * dt, Ntot_snapshots_lab=2,
        gamma_boost=gamma_b, period=1, sim=sim,
        species={"electrons": elec}, write_dir=wdir)
    sim.diags.append(diag)
    sim.step(8, show_progress=False)
    # Force-flush any remaining snapshots
    for i, snap in enumerate(diag.snapshots):
        if not snap["written"]:
            diag._flush(i, snap)
            snap["written"] = True
    fn = os.path.join(wdir, "hdf5", "particles%08d.h5")
    found_any = False
    for i in range(2):
        path = fn % i
        if not os.path.exists(path):
            continue
        with h5py.File(path, "r") as f:
            sp = f["/data/%d/particles/electrons" % i]
            for rec in ("position", "momentum", "weighting", "charge",
                        "mass", "positionOffset"):
                assert rec in sp, f"missing {rec}"
            for comp in "xyz":
                assert comp in sp["position"]
                assert comp in sp["momentum"]
            assert "unitDimension" in sp["position"].attrs
            found_any = True
    assert found_any, "no BTF particle files written"
