"""External prescribed fields applied to particles.

Counterpart of /root/reference/tests/test_external_fields.py: particles
in a prescribed field move according to the analytic solution.
"""
import numpy as np
import jax.numpy as jnp

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e
from fbpic_tpu.lpa_utils.external_fields import ExternalField


def test_uniform_external_Ez_acceleration():
    Nz, Nr, Nm = 32, 8, 1
    zmax, rmax = 3.2e-6, 4.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=0)
    # A few test electrons at rest (use a tiny uniform species)
    view = sim.add_new_species(q=-e, m=m_e, n=1.0, p_nz=1, p_nr=1, p_nt=1,
                               p_zmin=0, p_zmax=zmax, p_rmin=0.,
                               p_rmax=2.e-6, continuous_injection=False)
    E0 = 1.e9

    def field_func(F, x, y, z, t, amplitude, length_scale):
        return F + amplitude

    sim.external_fields.append(
        ExternalField(field_func, "Ez", E0, 0.0, species=view))
    N = 40
    sim.step(N, show_progress=False)

    # Analytic: du_z/dt = qE/mc (fields on the grid stay ~0: the external
    # field is not deposited). The Vay push applies E for N full steps.
    uz_expected = -e * E0 * (N * dt) / (m_e * c)
    uz = view.uz
    live = view.w != 0
    assert np.allclose(uz[live], uz_expected, rtol=2e-2)
