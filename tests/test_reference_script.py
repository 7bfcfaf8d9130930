"""Reference-input-script compatibility: the reference's documented
LWFA example (docs/source/example_input/lwfa_script.py) must run with
ONLY the `fbpic` -> `fbpic_tpu` import swap, including checkpointing
and restart continuity -- the analog of
/root/reference/tests/test_example_docs_scripts.py:25-40.

The script body below follows the reference example line for line
(API surface: Simulation ctor kwargs incl. use_cuda, add_new_species
with dens_func, GaussianLaser, add_laser_pulse, elec.track(sim.comm),
sim.fld, sim.diags assignment, set_periodic_checkpoint,
restart_from_checkpoint) with reduced grid/steps so the f64 CPU test
stays fast.
"""
import os

import numpy as np
import h5py
from scipy.constants import c, e, m_e

# The reference script's imports, swapped fbpic -> fbpic_tpu:
from fbpic_tpu.main import Simulation
from fbpic_tpu.lpa_utils.laser import add_laser_pulse
from fbpic_tpu.lpa_utils.laser.laser_profiles import GaussianLaser
from fbpic_tpu.openpmd_diag import FieldDiagnostic, ParticleDiagnostic, \
     set_periodic_checkpoint, restart_from_checkpoint

# Reduced-size parameters (structure identical to the reference script)
use_cuda = True
n_order = 16
Nz, zmax, zmin = 120, 9.e-6, -3.e-6
Nr, rmax, Nm = 20, 10.e-6, 2
dt = (zmax - zmin) / Nz / c
p_zmin, p_zmax, p_rmax = 3.e-6, 500.e-6, 9.e-6
n_e = 4.e24
p_nz, p_nr, p_nt = 1, 2, 4
a0, w0, tau, z0 = 2., 4.e-6, 10.e-15, 3.e-6
v_window = c
diag_period = 10
checkpoint_period = 16
track_electrons = True
ramp_start, ramp_length = 3.e-6, 10.e-6


def dens_func(z, r):
    n = np.ones_like(z)
    n = np.where(z < ramp_start + ramp_length,
                 (z - ramp_start) / ramp_length, n)
    n = np.where(z < ramp_start, 0., n)
    return n


def run(N_step, use_restart, wdir, save_checkpoints):
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=zmin,
                     n_order=n_order, use_cuda=use_cuda,
                     boundaries={'z': 'open', 'r': 'reflective'},
                     verbose_level=0, random_seed=0)
    elec = sim.add_new_species(q=-e, m=m_e, n=n_e,
                               dens_func=dens_func, p_zmin=p_zmin,
                               p_zmax=p_zmax, p_rmax=p_rmax,
                               p_nz=p_nz, p_nr=p_nr, p_nt=p_nt)
    laser_profile = GaussianLaser(a0, w0, tau, z0)
    add_laser_pulse(sim, laser_profile)
    if use_restart is False:
        if track_electrons:
            elec.track(sim.comm)
    else:
        restart_from_checkpoint(sim, checkpoint_dir=wdir)
    sim.set_moving_window(v=v_window)
    sim.diags = [
        FieldDiagnostic(diag_period, sim.fld, comm=sim.comm,
                        write_dir=wdir),
        ParticleDiagnostic(diag_period, {"electrons": elec},
                           select={"uz": [1., None]}, comm=sim.comm,
                           write_dir=wdir, sim=sim)]
    if save_checkpoints:
        set_periodic_checkpoint(sim, checkpoint_period,
                                checkpoint_dir=wdir)
    sim.step(N_step)
    return sim


def test_reference_lwfa_script_restart(tmp_path):
    wdir = str(tmp_path / "diags")
    # Original run: 32 steps with a checkpoint at 16
    run(32, use_restart=False, wdir=wdir, save_checkpoints=True)
    f = h5py.File(os.path.join(wdir, "hdf5", "data%08d.h5" % 30), "r")
    Ez_orig = f["/data/30/fields/E/z"][:]
    rho_orig = f["/data/30/fields/rho"][:]
    f.close()

    # Restarted run: continue from iteration 16 to 32
    run(16, use_restart=True, wdir=wdir, save_checkpoints=False)
    f = h5py.File(os.path.join(wdir, "hdf5", "data%08d.h5" % 30), "r")
    Ez_rest = f["/data/30/fields/E/z"][:]
    rho_rest = f["/data/30/fields/rho"][:]
    f.close()

    scale = np.abs(Ez_orig).max()
    assert scale > 0
    assert np.abs(Ez_rest - Ez_orig).max() < 1e-8 * scale
    r_scale = np.abs(rho_orig).max()
    assert np.abs(rho_rest - rho_orig).max() < 1e-8 * r_scale
