"""Moving window + continuous injection tests.

Counterparts of reference tests `test_continuous_injection.py` (no
density seam between initial and injected plasma) and the moving-window
laser propagation used throughout the reference examples.
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser


def test_window_follows_laser():
    """A laser in vacuum stays centered in a c-speed moving window."""
    Nz, Nr, Nm = 160, 24, 2
    zmax, rmax = 16.e-6, 20.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     n_order=16, boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    z0 = 8.e-6
    profile = GaussianLaser(a0=0.01, waist=6.e-6, tau=8.e-15, z0=z0,
                            lambda0=0.8e-6)
    add_laser_pulse(sim, profile)
    sim.set_moving_window(v=c)

    N_step = 240   # window travels 1.5 box lengths
    sim.step(N_step, show_progress=False)

    z = sim.grid_z()
    Er = sim.get_interp_field("Er", 1)
    env = np.abs(Er[:, 0])
    centroid = np.sum(z * env**2) / np.sum(env**2)
    # Laser moved with the window: stays at the same relative position
    expected = z0 + c * sim.time
    assert env.max() > 0.3 * 4e10  # pulse is still in the box, not damped
    assert abs(centroid - expected) < 3 * zmax / Nz
    # The window moved by ~N_step cells
    assert abs(sim.zmin - (-sim.nd_edge * sim.config.dz + c * sim.time)) \
        < 2 * sim.config.dz


def test_continuous_injection_uniform_density():
    """Injected plasma shows no density seam as the window moves."""
    Nz, Nr, Nm = 120, 16, 2
    zmax, rmax = 12.e-6, 12.e-6
    dt = zmax / Nz / c
    n_e = 1.e24
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin=0., p_zmax=zmax, p_rmin=0., p_rmax=0.75 * rmax,
                     p_nz=2, p_nr=2, p_nt=4, n_e=n_e,
                     n_order=16, boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    sim.set_moving_window(v=c)

    # Move the window by ~0.8 box length
    N_step = 100
    sim.step(N_step, correct_currents=True, show_progress=False)

    rho = sim.get_interp_field("rho", 0).real
    # Check uniformity in the physical region (exclude a few edge cells
    # and large radii where the plasma column ends)
    inner = rho[10:-10, :8]
    expected = -e * n_e
    assert np.allclose(inner, expected, rtol=0.1), (
        f"min {inner.min():.3e} max {inner.max():.3e} expected {expected:.3e}")
    # Moderate noise level in the bulk
    assert np.std(inner) < 0.05 * abs(expected)


if __name__ == "__main__":
    test_window_follows_laser()
    test_continuous_injection_uniform_density()
