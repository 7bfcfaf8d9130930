"""Space-charge initialization of a relativistic Gaussian bunch.

Counterpart of /root/reference/tests/test_space_charge.py: the
transverse E and B fields of the initialized bunch must match the
high-gamma analytic fields of a Gaussian charge distribution, and
E_r ~ c B_t (relativistic beam).
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, epsilon_0
from fbpic_tpu.lpa_utils.bunch import add_particle_bunch_gaussian
from fbpic_tpu.constants import m_e

# Bunch parameters (reference test values)
sig_r = 3.e-6
sig_z = 3.e-6
gamma0 = 15.
Q = 10.e-12
# Box
Nz, Nr, Nm = 160, 50, 1
zmax, rmax = 40.e-6, 20.e-6
zf = 20.e-6
dt = zmax / Nz / c


def test_gaussian_bunch_space_charge():
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=0.0, n_order=32,
                     random_seed=0)
    add_particle_bunch_gaussian(
        sim, q=-e, m=m_e, sig_r=sig_r, sig_z=sig_z, n_emit=0.0,
        gamma0=gamma0, sig_gamma=0.0,
        n_physical_particles=Q / e, n_macroparticles=40000,
        zf=zf, symmetrize=True)

    Er = sim.get_interp_field("Er", 0).real
    Bt = sim.get_interp_field("Bt", 0).real
    z = sim.grid_z()
    r = sim.grid_r()
    zg, rg = np.meshgrid(z, r, indexing="ij")

    Eth = -Q / (2 * np.pi) ** 1.5 / sig_z / epsilon_0 / rg * \
        (1 - np.exp(-0.5 * rg**2 / sig_r**2)) * \
        np.exp(-0.5 * (zg - zf) ** 2 / sig_z**2)
    Bth = Eth / c

    assert np.allclose(Er, Eth, atol=0.1 * np.abs(Eth).max())
    assert np.allclose(Bt, Bth, atol=0.1 * np.abs(Bth).max())

    # Symmetrized beam: exactly zero transverse mean
    p = sim.ptcl[-1]
    for quantity in (p.x, p.y, p.ux, p.uy):
        live = p.w != 0
        assert abs(quantity[live].mean()) < 1e-10 * (quantity[live].std()
                                                     + 1e-30)


if __name__ == "__main__":
    test_gaussian_bunch_space_charge()
