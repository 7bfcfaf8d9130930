"""Compton scattering smoke + rate test.

Counterpart of /root/reference/tests/test_compton.py (which checks the
scattered photon number against the Klein-Nishina rate): here electrons
at rest inside a constant-density photon bath (the center of a long
pulse) must scatter at the Thomson rate sigma_T n c dt.
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e


def test_thomson_rate():
    Nz, Nr, Nm = 16, 8, 1
    zmax, rmax = 1.6e-6, 2.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=5)
    elec = sim.add_new_species(q=-e, m=m_e, n=1e20, p_nz=4, p_nr=4, p_nt=4,
                               p_zmin=0, p_zmax=zmax, p_rmin=0,
                               p_rmax=1.5e-6, continuous_injection=False)
    photons = sim.add_new_species(q=0., m=0., capacity=131072,
                                  continuous_injection=False)

    # A very long, very wide pulse => approximately constant density
    laser_wavelength = 0.8e-6
    laser_waist = 1.0e-3        # >> box
    laser_ctau = 1.0e-2         # >> box
    laser_energy = 1.0e6        # scaled to give a small rate per step
    elec.activate_compton(
        photons, laser_energy=laser_energy,
        laser_wavelength=laser_wavelength, laser_waist=laser_waist,
        laser_ctau=laser_ctau, laser_initial_z0=0.0)

    # Expected Thomson rate (k << 1)
    import fbpic_tpu.particles.compton as cm
    from fbpic_tpu.constants import hbar
    sigma_T = 8. / 3 * np.pi * cm.R_E**2
    photon_p = 2 * np.pi * hbar / laser_wavelength
    eff_vol = (np.pi / 2.) ** 1.5 * laser_waist**2 * laser_ctau
    n_peak = laser_energy / (eff_vol * photon_p * c)
    p_step = sigma_T * n_peak * c * dt
    assert p_step < 0.1

    N = 20
    n_elec = int((elec.w != 0).sum())
    sim.step(N, correct_currents=False, show_progress=False)

    n_phot = int((photons.w != 0).sum())
    expected = n_elec * (1 - (1 - p_step) ** N)
    # Poisson statistics: 5-sigma tolerance
    tol = 5 * np.sqrt(expected)
    print(f"photons {n_phot}, expected {expected:.0f} +- {np.sqrt(expected):.0f}")
    assert abs(n_phot - expected) < tol


if __name__ == "__main__":
    test_thomson_rate()
