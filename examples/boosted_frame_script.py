"""Boosted-frame LWFA (TPU): simulate a long plasma in a Lorentz-
boosted frame and record back-transformed lab-frame diagnostics.

The fbpic_tpu analog of the reference's boosted-frame example
(reference: docs/source/example_input/boosted_frame_script.py):
gamma_boost=10 frame, Galilean (NCI-suppressing) scheme, lab-frame
field snapshots via BackTransformedFieldDiagnostic.
"""
import numpy as np
from scipy.constants import c, e, m_e

from fbpic_tpu import Simulation
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
from fbpic_tpu.lpa_utils.boosted_frame import BoostConverter
from fbpic_tpu.diagnostics import BackTransformedFieldDiagnostic

gamma_boost = 10.
boost = BoostConverter(gamma_boost)

# Lab-frame box, converted to the boosted frame
Nz, zmax_lab, zmin_lab = 2048, 0.e-6, -40.e-6
Nr, rmax, Nm = 50, 40.e-6, 2
n_e_lab = 1.e24
v_window_lab = c


# Smoke-test mode (used by tests/test_examples.py): tiny grid, few steps
import os
_SMOKE = bool(os.environ.get("FBPIC_TPU_EXAMPLE_SMOKE"))

N_step = 4000
N_ORDER, PPC, DIAG_PERIOD, NSNAP = 32, (2, 2, 4), 25, 20
if _SMOKE:
    Nz, Nr, Nm, N_ORDER = 256, 12, 2, 16
    PPC, DIAG_PERIOD, NSNAP, N_step = (1, 1, 4), 4, 3, 8

if __name__ == "__main__":
    zmin, zmax = boost.static_length([zmin_lab, zmax_lab])
    dt = (zmax - zmin) / Nz / c
    n_e, = boost.static_density([n_e_lab])
    v_window, = boost.velocity([v_window_lab])

    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=zmin,
                     n_order=N_ORDER, gamma_boost=gamma_boost,
                     v_comoving=-c * np.sqrt(1. - 1. / gamma_boost**2),
                     use_galilean=True,
                     boundaries={'z': 'open', 'r': 'reflective'})
    sim.add_new_species(q=-e, m=m_e, n=n_e,
                        p_zmin=0., p_zmax=boost.static_length(
                            [2000.e-6])[0],
                        p_rmax=35.e-6, p_nz=PPC[0], p_nr=PPC[1], p_nt=PPC[2],
                        continuous_injection=True,
                        boost_positions_in_dens_func=True)

    add_laser_pulse(sim, GaussianLaser(a0=2., waist=10.e-6,
                                       tau=30.e-15, z0=-15.e-6),
                    gamma_boost=gamma_boost)
    sim.set_moving_window(v=v_window)

    sim.diags = [
        BackTransformedFieldDiagnostic(
            zmin_lab, zmax_lab, v_window_lab, dt_snapshots_lab=50.e-15,
            Ntot_snapshots_lab=NSNAP, gamma_boost=gamma_boost,
            period=DIAG_PERIOD, fldobject=sim.fld, comm=sim.comm),
    ]
    sim.step(N_step)
