"""Laser antenna test: the emitted pulse matches the direct-injected one.

Counterpart of the reference's antenna injection (antenna_injection.py).
The antenna's current passes through the deposition shape factor and the
binomial source filter every step, so the emitted amplitude carries the
(resolution-dependent) factor  sinc^2(k0 dz/2) * (1 - sin^2(k0 dz/2)) --
the same attenuation the reference's virtual-particle antenna incurs.
The test checks amplitude (against that prediction), position, and
duration of the emitted pulse against a direct injection.
"""
import numpy as np
import pytest
from scipy.signal import hilbert

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

Nz, Nr, Nm = 600, 32, 2      # 16 points per laser period
zmax, rmax = 30.e-6, 25.e-6
dt = zmax / Nz / c
a0 = 0.01
waist = 6.e-6
tau = 8.e-15
lambda0 = 0.8e-6
z_antenna = 12.e-6
z0 = z_antenna - 3 * c * tau
N_step = 200


def _envelope(sim):
    Er = sim.get_interp_field("Er", 1)
    return np.abs(hilbert(2 * Er[:, 0].real))


def _fwhm(z, env):
    half = env.max() / 2
    above = np.where(env > half)[0]
    return z[above[-1]] - z[above[0]]


def test_antenna_vs_direct():
    bnd = {"z": "open", "r": "reflective"}
    profile = GaussianLaser(a0=a0, waist=waist, tau=tau, z0=z0,
                            zf=z_antenna, lambda0=lambda0)

    sim_a = Simulation(Nz, zmax, Nr, rmax, Nm, dt, n_order=16,
                       boundaries=bnd, random_seed=0)
    add_laser_pulse(sim_a, profile, method="antenna",
                    z0_antenna=z_antenna)
    sim_a.step(N_step, correct_currents=False, show_progress=False)

    sim_d = Simulation(Nz, zmax, Nr, rmax, Nm, dt, n_order=16,
                       boundaries=bnd, random_seed=0)
    add_laser_pulse(sim_d, profile, method="direct")
    sim_d.step(N_step, correct_currents=False, show_progress=False)

    z = sim_a.grid_z()
    env_a = _envelope(sim_a)
    env_d = _envelope(sim_d)
    fwd = z > z_antenna + 2.e-6

    # Predicted emission attenuation at this resolution
    k0dz2 = np.pi / lambda0 * zmax / Nz
    att = (np.sin(k0dz2) / k0dz2) ** 2 * (1 - np.sin(k0dz2) ** 2)

    peak_a = env_a[fwd].max()
    peak_d = env_d[fwd].max()
    ratio = peak_a / peak_d
    print(f"peak ratio {ratio:.4f}, predicted attenuation {att:.4f}")
    assert abs(ratio - att) < 0.03

    # Same position (within 3 cells) and same duration (within 15%)
    za = z[fwd][np.argmax(env_a[fwd])]
    zd = z[fwd][np.argmax(env_d[fwd])]
    assert abs(za - zd) < 3 * zmax / Nz
    fa = _fwhm(z[fwd], env_a[fwd])
    fd = _fwhm(z[fwd], env_d[fwd])
    print(f"FWHM antenna {fa*1e6:.2f} um, direct {fd*1e6:.2f} um")
    assert abs(fa - fd) < 0.15 * fd


if __name__ == "__main__":
    test_antenna_vs_direct()
