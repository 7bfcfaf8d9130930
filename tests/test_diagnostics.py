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
