"""Ionization injection (TPU): nitrogen N5+ electrons trapped in the
wake of an a0=4 laser.

The fbpic_tpu analog of the reference's ionization example
(reference: docs/source/example_input/ionization_script.py): a
pre-ionized N5+ species carries ADK tunnel ionization; electrons
stripped from the 6th and 7th levels are routed to a separate,
tracked species that the particle diagnostic records.
"""
from scipy.constants import c, e, m_e, m_p

from fbpic_tpu import Simulation
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
from fbpic_tpu.diagnostics import FieldDiagnostic, ParticleDiagnostic

Nz, zmax, zmin = 800, 30.e-6, -10.e-6
Nr, rmax, Nm = 50, 20.e-6, 2
dt = (zmax - zmin) / Nz / c


# Smoke-test mode (used by tests/test_examples.py): tiny grid, few steps
import os
_SMOKE = bool(os.environ.get("FBPIC_TPU_EXAMPLE_SMOKE"))

N_step = 2000
N_ORDER, PPC, DIAG = 32, (2, 2, 4), 50
if _SMOKE:
    Nz, Nr, Nm, N_ORDER = 160, 16, 2, 16
    dt = (zmax - zmin) / Nz / c
    PPC, DIAG, N_step = (1, 1, 4), 4, 8

if __name__ == "__main__":
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=zmin,
                     n_order=N_ORDER,
                     boundaries={'z': 'open', 'r': 'reflective'})
    # Background electrons + He ions (fully pre-ionized helium)
    elec = sim.add_new_species(q=-e, m=m_e, n=4.e24,
                               p_zmin=0.e-6, p_zmax=500.e-6,
                               p_rmax=18.e-6, p_nz=PPC[0], p_nr=PPC[1],
                               p_nt=PPC[2])
    # N5+ dopant: ADK-ionizable from level 5 upward
    ion = sim.add_new_species(q=5 * e, m=14. * m_p, n=1.e23,
                              p_zmin=0.e-6, p_zmax=500.e-6,
                              p_rmax=18.e-6, p_nz=PPC[0], p_nr=PPC[1],
                              p_nt=PPC[2])
    # Electrons from the N5+ -> N7+ levels land in their own species
    elec_from_N = sim.add_new_species(q=-e, m=m_e)
    ion.make_ionizable('N', target_species=elec_from_N, level_start=5)
    elec_from_N.track(sim.comm)

    add_laser_pulse(sim, GaussianLaser(a0=4., waist=5.e-6,
                                       tau=16.7e-15, z0=-8.e-6))
    sim.set_moving_window(v=c)
    sim.diags = [
        FieldDiagnostic(DIAG, sim.fld, comm=sim.comm),
        ParticleDiagnostic(DIAG, {"electrons from N": elec_from_N},
                           comm=sim.comm),
    ]
    sim.step(N_step)
