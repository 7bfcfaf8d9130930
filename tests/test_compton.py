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


def _bath_sim(uz0=0.0, laser_energy=1.0e6, seed=7, capacity=262144):
    """Electrons in a quasi-uniform photon bath (pulse >> box)."""
    Nz, Nr, Nm = 16, 8, 1
    zmax, rmax = 1.6e-6, 2.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=seed)
    elec = sim.add_new_species(q=-e, m=m_e, n=1e20, p_nz=4, p_nr=4, p_nt=4,
                               p_zmin=0, p_zmax=zmax, p_rmin=0,
                               p_rmax=1.5e-6, uz_m=uz0,
                               continuous_injection=False)
    photons = sim.add_new_species(q=0., m=0., capacity=capacity,
                                  continuous_injection=False)
    elec.activate_compton(
        photons, laser_energy=laser_energy, laser_wavelength=0.8e-6,
        laser_waist=1.0e-3, laser_ctau=1.0e-2, laser_initial_z0=0.0)
    return sim, elec, photons


def test_thomson_angular_distribution():
    """Electrons at rest, k << 1: the scattered photons must follow the
    Thomson angular distribution dsigma/dcos(theta) ~ (1 + cos^2).

    Validates the Klein-Nishina rejection sampling (reference:
    numba_methods.py:180-202, Ozmutl 1992) in its k->0 limit.
    """
    sim, elec, photons = _bath_sim(laser_energy=2.0e7)
    sim.step(30, correct_currents=False, show_progress=False)
    w = np.asarray(photons.w)
    sel = w != 0
    n_phot = int(sel.sum())
    assert n_phot > 3000, f"too few photons for statistics: {n_phot}"
    ux, uy, uz = (np.asarray(photons.ux)[sel], np.asarray(photons.uy)[sel],
                  np.asarray(photons.uz)[sel])
    u = np.sqrt(ux**2 + uy**2 + uz**2)
    # theta measured from the incoming photon direction (-z)
    cos_t = -uz / u
    hist, edges = np.histogram(cos_t, bins=10, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    expected = (1 + centers**2) * 3. / 8.   # normalized over [-1, 1]
    err = np.abs(hist - expected)
    # ~n_phot/10 per bin -> ~5/sqrt(n/10) statistical tolerance
    tol = 6. / np.sqrt(n_phot / 10.)
    assert np.all(err < expected * 0.25 + tol), (hist, expected)


def test_inverse_compton_energy():
    """Relativistic electrons vs counter-propagating laser: the
    backscattered photon energy must reach ~4 gamma^2 E_laser and the
    photons must be forward-beamed (within ~1/gamma)."""
    from fbpic_tpu.constants import hbar
    uz0 = 10.0
    gamma0 = np.sqrt(1 + uz0**2)
    sim, elec, photons = _bath_sim(uz0=uz0, laser_energy=2.0e7)
    sim.step(20, correct_currents=False, show_progress=False)
    w = np.asarray(photons.w)
    sel = w != 0
    assert sel.sum() > 1000
    ux, uy, uz = (np.asarray(photons.ux)[sel], np.asarray(photons.uy)[sel],
                  np.asarray(photons.uz)[sel])
    u = np.sqrt(ux**2 + uy**2 + uz**2)
    # photon energy / (m_e c^2) = |u|; laser photon energy:
    k_laser = (2 * np.pi * hbar / 0.8e-6) / (m_e * c)
    beta0 = uz0 / gamma0
    # exact backscatter formula for k_rest << 1:
    # E_max = (1 + beta0)^2 gamma0^2 E_laser
    e_max_expected = (1 + beta0) ** 2 * gamma0**2 * k_laser
    e_max = u.max()
    assert 0.8 * e_max_expected < e_max <= 1.02 * e_max_expected, \
        (e_max, e_max_expected)
    # forward beaming: mean longitudinal fraction ~ 1 for gamma >> 1
    assert np.mean(uz / u) > 0.9


def test_multi_photon_ratio():
    """ratio_w_electron_photon > 1 multiplies the expected macrophoton
    count (nscatter = int(p*ratio + rand), numba_methods.py:93-99) and
    divides their weight."""
    ratio = 25.0
    sim, elec, photons = _bath_sim(laser_energy=1.0e6)
    # re-activate with the ratio
    elec.activate_compton(
        photons, laser_energy=1.0e6, laser_wavelength=0.8e-6,
        laser_waist=1.0e-3, laser_ctau=1.0e-2, laser_initial_z0=0.0,
        ratio_w_electron_photon=ratio)
    n_elec = int((elec.w != 0).sum())
    w_e = np.asarray(elec.w)[np.asarray(elec.w) != 0]
    import fbpic_tpu.particles.compton as cm
    from fbpic_tpu.constants import hbar
    sigma_T = 8. / 3 * np.pi * cm.R_E**2
    photon_p = 2 * np.pi * hbar / 0.8e-6
    eff_vol = (np.pi / 2.) ** 1.5 * (1.0e-3)**2 * 1.0e-2
    n_peak = 1.0e6 / (eff_vol * photon_p * c)
    dt = sim.dt
    p_step = sigma_T * n_peak * c * dt
    N = 10
    sim.step(N, correct_currents=False, show_progress=False)
    w = np.asarray(photons.w)
    n_phot = int((w != 0).sum())
    expected = n_elec * N * p_step * ratio
    assert abs(n_phot - expected) < 6 * np.sqrt(expected), (n_phot, expected)
    # photon weight = (emitting electron's weight) / ratio; electron
    # weights vary with r, so check the bounds
    w_ph = w[w != 0] * ratio
    assert w_ph.min() >= w_e.min() * (1 - 1e-6)
    assert w_ph.max() <= w_e.max() * (1 + 1e-6)


if __name__ == "__main__":
    test_thomson_rate()
    test_thomson_angular_distribution()
    test_inverse_compton_energy()
    test_multi_photon_ratio()
