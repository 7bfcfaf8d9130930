"""Standard laser-wakefield acceleration input script (TPU).

The fbpic_tpu analog of the reference's documented LWFA example
(reference: docs/source/example_input/lwfa_script.py): a0=4 Gaussian
laser driving a nonlinear wake in a moving window, with openPMD field
and particle diagnostics and periodic checkpointing.

Run on one TPU chip:   python lwfa_script.py
The whole PIC step is one jit-compiled XLA program; the first step
compiles (~30 s), subsequent steps run device-resident.
"""
import numpy as np
from scipy.constants import c, e, m_e

from fbpic_tpu import Simulation
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
from fbpic_tpu.diagnostics import (FieldDiagnostic, ParticleDiagnostic,
                                   set_periodic_checkpoint,
                                   restart_from_checkpoint)

# Whether to restart from a previous checkpoint
use_restart = False

# The simulation box
Nz, zmax, zmin = 800, 30.e-6, -10.e-6
Nr, rmax, Nm = 50, 20.e-6, 2
dt = (zmax - zmin) / Nz / c
n_order = 32

# The plasma
p_zmin, p_zmax = 0.e-6, 500.e-6
p_rmax = 18.e-6
n_e = 4.e24
p_nz, p_nr, p_nt = 2, 2, 4

# The laser
a0, w0, tau, z0 = 4., 5.e-6, 16.7e-15, -8.e-6

# Diagnostics
diag_period = 50
checkpoint_period = 100
N_step = 2000


# Smoke-test mode (used by tests/test_examples.py): tiny grid, few steps
import os
_SMOKE = bool(os.environ.get("FBPIC_TPU_EXAMPLE_SMOKE"))

if _SMOKE:
    Nz, Nr, Nm, n_order = 160, 16, 2, 16
    dt = (zmax - zmin) / Nz / c
    p_nz, p_nr, p_nt = 1, 1, 4
    diag_period, checkpoint_period, N_step = 4, 8, 10

if __name__ == "__main__":
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin=p_zmin, p_zmax=p_zmax, p_rmin=0.,
                     p_rmax=p_rmax, p_nz=p_nz, p_nr=p_nr, p_nt=p_nt,
                     n_e=n_e, zmin=zmin, n_order=n_order,
                     boundaries={'z': 'open', 'r': 'reflective'})
    elec = sim.ptcl[0]
    elec.track(sim.comm)

    add_laser_pulse(sim, GaussianLaser(a0=a0, waist=w0, tau=tau, z0=z0))
    sim.set_moving_window(v=c)

    sim.diags = [
        FieldDiagnostic(diag_period, sim.fld, comm=sim.comm),
        ParticleDiagnostic(diag_period, {"electrons": elec},
                           select={"uz": [1., None]}, comm=sim.comm),
    ]
    set_periodic_checkpoint(sim, checkpoint_period)
    if use_restart:
        restart_from_checkpoint(sim)

    sim.step(N_step)
