"""Galilean PSATD suppresses the numerical Cherenkov instability.

Counterpart of /root/reference/tests/test_boosted.py: a relativistic
plasma flows through a periodic box; with the standard scheme the
E_r RMS grows exponentially, with the Galilean (and comoving) scheme
it stays bounded.
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c

Nz = 40
zmax = 7.86
zmin = -7.86
Nr = 20
rmax = 7.86
Nm = 2
dt = (zmax - zmin) / Nz / c
N_step = 600
gamma_boost = 130.
uz_m = np.sqrt(gamma_boost**2 - 1)
n_e = gamma_boost / (4 * 3.14 * 2.81e-15)
p_nz, p_nr, p_nt = 2, 2, 4


def get_Er_rms(sim):
    Er0 = sim.get_interp_field("Er", 0)
    Er1 = sim.get_interp_field("Er", 1)
    return float(np.sqrt(np.average(np.abs(Er0)**2 + np.abs(Er1)**2)))


def _growth_slope(scheme):
    if scheme == "standard":
        v_comoving = None
        use_galilean = False
    else:
        v_comoving = 0.9999 * c
        use_galilean = (scheme == "galilean")
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     zmin, zmax, 0., rmax, p_nz, p_nr, p_nt, n_e,
                     zmin=zmin, initialize_ions=True,
                     v_comoving=v_comoving, use_galilean=use_galilean,
                     random_seed=0)
    for view in sim.ptcl:
        view.uz = uz_m * np.ones(view.Ntot)
        view.inv_gamma = 1. / np.sqrt(1 + uz_m**2) * np.ones(view.Ntot)
    sim.step(N_step - 30, show_progress=False)
    rms_a = get_Er_rms(sim)
    sim.step(30, show_progress=False)
    rms_b = get_Er_rms(sim)
    return np.log(rms_b) - np.log(rms_a)


def test_cherenkov_instability():
    slope_std = _growth_slope("standard")
    slope_gal = _growth_slope("galilean")
    slope_com = _growth_slope("comoving")
    print("growth slopes: standard %.3f galilean %.3f comoving %.3f"
          % (slope_std, slope_gal, slope_com))
    assert slope_std > 3.5 * slope_gal
    assert slope_std > 3.5 * slope_com


if __name__ == "__main__":
    test_cherenkov_instability()
