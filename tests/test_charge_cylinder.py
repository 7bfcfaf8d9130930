"""Space-charge field of an on-axis charge cylinder, down to radii far
below one radial cell -- mirror of the reference's
tests/test_charge_cylinder.py (validates the Ruyten-corrected shapes +
modified cell volumes: Gauss's law -Er*r = n e a^2 / (2 eps0) must
hold outside the cylinder for every radius scale)."""
import numpy as np
import pytest
from scipy.constants import c, e, epsilon_0

from fbpic_tpu import Simulation
from fbpic_tpu.lpa_utils.bunch import get_space_charge_fields

Nz, zmax, zmin = 10, 10.e-6, -10.e-6
Nr, rmax, Nm = 20, 2.e-6, 1
p_rmax = 1.e-6
n_e = 4.e24
SCALES = [1.0, 0.5, 0.25, 0.1, 0.05, 0.025, 0.01]


@pytest.mark.parametrize("shape", ["linear", "cubic"])
def test_charge_cylinder(shape):
    for scale in SCALES:
        sim = Simulation(Nz, zmax, Nr, rmax, Nm, (zmax - zmin) / Nz / c,
                         zmin=zmin, particle_shape=shape,
                         boundaries={"z": "periodic", "r": "reflective"},
                         random_seed=0, verbose_level=0)
        from fbpic_tpu.constants import m_e
        elec = sim.add_new_species(
            q=-e, m=m_e, n=n_e, p_zmin=zmin, p_zmax=zmax,
            p_rmin=0., p_rmax=p_rmax, p_nz=1, p_nr=8, p_nt=1)
        # Shrink the cylinder radius (possibly below one radial cell)
        elec.x = np.asarray(elec.x) * scale
        elec.y = np.asarray(elec.y) * scale
        get_space_charge_fields(sim, elec)

        Er = np.asarray(sim.get_interp_field("Er", 0).real).mean(axis=0)
        r = (np.arange(Nr) + 0.5) * (rmax / Nr)
        # Gauss: outside the cylinder -Er*r equals the enclosed charge
        # per unit length / (2 pi eps0).  The macroparticle weights do
        # not rescale with the radius, so the enclosed charge -- and
        # hence the outer field -- is the SAME for every scale; what
        # the scan tests is that depositing the whole cylinder into a
        # fraction of one radial cell (Ruyten shapes + modified
        # volumes) conserves its charge exactly.
        expected = n_e * e * p_rmax ** 2 / (2 * epsilon_0)
        got = (-Er * r)[-5:]
        assert np.allclose(got, expected, rtol=1.e-3), (shape, scale)
