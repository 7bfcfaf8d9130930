"""rho_prev reuse (moving window) must match the full re-deposit path.

With reuse_rho_prev=True the step uses shift(previous rho_next) plus an
exact injected-column delta instead of re-depositing rho_prev from the
full particle set (reference re-deposits every step: main.py:435-449).
The deposit edge mask makes particle removal a no-op for rho, so the two
paths agree to roundoff.
"""
import numpy as np

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser


def _run(reuse):
    Nz, Nr = 160, 24
    dt = 16.e-6 / Nz / c
    sim = Simulation(Nz, 12.e-6, Nr, 10.e-6, 2, dt, p_zmin=0.,
                     p_zmax=200.e-6, p_rmax=9.e-6, p_nz=2, p_nr=2, p_nt=4,
                     n_e=4.e24, zmin=-4.e-6, n_order=16,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    add_laser_pulse(sim, GaussianLaser(a0=1., waist=4.e-6, tau=10.e-15,
                                       z0=-2.e-6))
    sim.set_moving_window(v=c)
    sim.step(40, show_progress=False, reuse_rho_prev=reuse)
    return (np.asarray(sim.get_interp_field("Ez", 0)),
            np.asarray(sim.get_interp_field("Er", 1)))


def test_rho_prev_reuse_parity():
    ez1, er1 = _run(True)
    ez0, er0 = _run(False)
    assert np.max(np.abs(ez1 - ez0)) < 1e-9 * np.max(np.abs(ez0))
    assert np.max(np.abs(er1 - er0)) < 1e-9 * np.max(np.abs(er0))


if __name__ == "__main__":
    test_rho_prev_reuse_parity()
