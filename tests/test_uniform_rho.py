"""Uniform plasma must deposit uniform rho (Ruyten shapes + modified
cell volumes) -- mirror of the reference's
tests/test_uniform_rho_deposition.py with its exact parameters and
tolerances (2e-3 in the plasma, 1e-10 outside and in mode 1).
"""
import numpy as np

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e

Nz, zmax = 250, 20.e-6
Nr, rmax, Nm = 50, 20.e-6, 2
p_nr, p_nz, p_nt = 8, 1, 4
p_rmax = 10.e-6
n = 9.e24


def _check(shape):
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, zmax / Nz / c,
                     0, zmax, 0, p_rmax, p_nz, p_nr, p_nt, n,
                     particle_shape=shape, verbose_level=0)
    rho = sim.deposit_single_species_rho(sim.ptcl[0])
    Nrmax = int(Nr * p_rmax / rmax)
    assert np.allclose(-n * e, rho[0][:, :Nrmax - 2].real, 2.e-3)
    assert np.allclose(0, rho[0][:, Nrmax + 2:], atol=1.e-10 * n * e)
    assert np.allclose(0, rho[1], atol=1.e-10 * n * e)


def test_uniform_rho_linear():
    _check("linear")


def test_uniform_rho_cubic():
    _check("cubic")
