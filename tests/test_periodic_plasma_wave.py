"""End-to-end test: linear periodic plasma wave vs analytic theory.

This is the direct counterpart of the reference's backbone test
(/root/reference/tests/test_periodic_plasma_wave.py): launch a linear
plasma eigenmode in modes 0, 1, 2 and compare E_z and E_r with the
closed-form solution after 0.75 plasma periods.  Tolerances are the
reference's (atol=1.1e6, rtol=2e-2).
"""
import numpy as np
import pytest

from fbpic_tpu.constants import c, e, m_e, epsilon_0
from fbpic_tpu import Simulation

# Simulation box
Nz = 200
zmax = 40.e-6
Nr = 64
rmax = 20.e-6
Nm = 3
n_order = 16
dt = zmax / Nz / c

# Particles
p_zmin = 0.e-6
p_zmax = 41.e-6
p_rmin = 0.
p_rmax = 18.e-6
n_e = 2.e24
p_nz = 2
p_nr = 2
p_nt = 8

# Plasma wave amplitudes
epsilons = [0.001, 0.001, 0.001]
w0 = 5.e-6
N_periods = 3
k0 = 2 * np.pi / zmax * N_periods
wp = np.sqrt(n_e * e**2 / (m_e * epsilon_0))

N_step = int(2 * np.pi / (wp * dt) * 0.75)


def Ez_analytic(z, r, t):
    env = np.exp(-r**2 / w0**2) * np.cos(k0 * z) * np.sin(wp * t)
    return (
        -epsilons[0] * m_e * c**2 / e * k0 * env
        - epsilons[1] * m_e * c**2 / e * k0 * 2 * r / w0 * env
        - epsilons[2] * m_e * c**2 / e * k0 * 4 * r**2 / w0**2 * env
    )


def Er_analytic(z, r, t):
    env = np.exp(-r**2 / w0**2) * np.sin(k0 * z) * np.sin(wp * t)
    return (
        epsilons[0] * m_e * c**2 / e * 2 * r / w0**2 * env
        - epsilons[1] * m_e * c**2 / e * 2 / w0 * env
        + epsilons[1] * m_e * c**2 / e * 4 * r**2 / w0**3 * env
        - epsilons[2] * m_e * c**2 / e * 8 * r / w0**2 * env
        + epsilons[2] * m_e * c**2 / e * 8 * r**3 / w0**4 * env
    )


def impart_momenta(ptcl):
    """Set the t=0 velocities of the plasma-wave eigenmode."""
    x, y, z = ptcl.x, ptcl.y, ptcl.z
    r = np.sqrt(x**2 + y**2)
    envelope = np.exp(-r**2 / w0**2)
    sin_z = np.sin(k0 * z)
    cos_z = np.cos(k0 * z)
    ux = (
        epsilons[0] * c / wp * 2 * x / w0**2
        - epsilons[1] * c / wp * 2 / w0
        + epsilons[1] * c / wp * 4 * x**2 / w0**3
        - epsilons[2] * c / wp * 8 * x / w0**2
        + epsilons[2] * c / wp * 8 * x * (x**2 - y**2) / w0**4
    ) * envelope * sin_z
    uy = (
        epsilons[0] * c / wp * 2 * y / w0**2
        + epsilons[1] * c / wp * 4 * x * y / w0**3
        + epsilons[2] * c / wp * 8 * y / w0**2
        + epsilons[2] * c / wp * 8 * y * (x**2 - y**2) / w0**4
    ) * envelope * sin_z
    uz = (
        -epsilons[0] * c / wp * k0
        - epsilons[1] * c / wp * k0 * 2 * x / w0
        - epsilons[2] * c / wp * k0 * 4 * (x**2 - y**2) / w0**2
    ) * envelope * cos_z
    ptcl.ux = ux
    ptcl.uy = uy
    ptcl.uz = uz
    ptcl.inv_gamma = 1. / np.sqrt(1 + ux**2 + uy**2 + uz**2)


def test_periodic_plasma_wave_linear_shape():
    _run_plasma_wave("linear")


def test_periodic_plasma_wave_cubic_shape():
    _run_plasma_wave("cubic")


def _run_plasma_wave(particle_shape):
    sim = Simulation(
        Nz, zmax, Nr, rmax, Nm, dt,
        p_zmin, p_zmax, p_rmin, p_rmax, p_nz, p_nr, p_nt, n_e,
        n_order=n_order, particle_shape=particle_shape, random_seed=0,
    )
    impart_momenta(sim.ptcl[0])
    sim.step(N_step, correct_currents=True, show_progress=False)

    # Reconstruct fields in the theta=0 half-plane: F = F0 + 2 Re(F1 + F2)
    z = sim.grid_z()
    r = sim.grid_r()
    rg, zg = np.meshgrid(r, z)

    Ez_sim = sim.get_interp_field("Ez", 0).real.copy()
    Er_sim = sim.get_interp_field("Er", 0).real.copy()
    for m in range(1, Nm):
        Ez_sim += 2 * sim.get_interp_field("Ez", m).real
        Er_sim += 2 * sim.get_interp_field("Er", m).real

    t = sim.time
    atol = 1.1e6
    rtol = 2e-2
    Ez_th = Ez_analytic(zg, rg, t)
    Er_th = Er_analytic(zg, rg, t)
    err_z = np.abs(Ez_sim - Ez_th).max()
    err_r = np.abs(Er_sim - Er_th).max()
    print("max|Ez| sim/theory:", np.abs(Ez_sim).max(), np.abs(Ez_th).max(),
          "err", err_z)
    print("max|Er| sim/theory:", np.abs(Er_sim).max(), np.abs(Er_th).max(),
          "err", err_r)
    assert np.allclose(Ez_th, Ez_sim, atol=atol, rtol=rtol)
    assert np.allclose(Er_th, Er_sim, atol=atol, rtol=rtol)


if __name__ == "__main__":
    test_periodic_plasma_wave_linear_shape()
    test_periodic_plasma_wave_cubic_shape()
