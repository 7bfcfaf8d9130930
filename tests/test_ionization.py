"""ADK ionization tests.

Validates the ionization rate wiring against the ADK formula itself
(prescribed static field -> ionized fraction = 1-(1-p)^N), and checks
electron creation into the target species.  The reference's full
physics benchmark (Chen JCP 2013 fig. 2) is run by
tests/test_ionization.py in the reference with a laser driver; here the
rate is checked directly, which is a sharper unit test.
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e, m_p
from fbpic_tpu.lpa_utils.external_fields import ExternalField
from fbpic_tpu.particles.ionization import build_ionizer_aux


def _adk_probability(element, level, E_field, dt):
    """Host-side ADK probability per timestep (rest frame, gamma=1)."""
    aux, _ = build_ionizer_aux(element, dt)
    pref = float(aux.adk_prefactor[level])
    power = float(aux.adk_power[level])
    exp_pref = float(aux.adk_exp_prefactor[level])
    w_dtau = pref * E_field**power * np.exp(exp_pref / E_field)
    return 1.0 - np.exp(-w_dtau)


def test_adk_rate_static_field():
    Nz, Nr, Nm = 16, 8, 1
    zmax, rmax = 1.6e-6, 2.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=3)

    # Hydrogen atoms at rest + an empty electron species
    atoms = sim.add_new_species(q=e, m=m_p, n=1e20, p_nz=4, p_nr=4, p_nt=4,
                                p_zmin=0, p_zmax=zmax, p_rmin=0,
                                p_rmax=1.5e-6, continuous_injection=False)
    elec = sim.add_new_species(q=-e, m=m_e, capacity=65536,
                               continuous_injection=False)
    atoms.make_ionizable("H", elec, level_start=0)

    # Field strength chosen so that p ~ 5% per step
    E0 = 3.2e10
    p_step = _adk_probability("H", 0, E0, dt)
    assert 0.005 < p_step < 0.5

    def field_func(F, x, y, z, t, amplitude, length_scale):
        return F + amplitude

    sim.external_fields.append(
        ExternalField(field_func, "Ex", E0, 0.0, species=atoms))

    N = 20
    sim.step(N, correct_currents=False, show_progress=False)

    # Ionized fraction matches 1 - (1-p)^N
    lev = np.asarray(sim.state.species[atoms._index].ionization_level)
    w = np.asarray(sim.state.species[atoms._index].w)
    live = w != 0
    frac = (lev[live] >= 1).mean()
    expected = 1.0 - (1.0 - p_step) ** N
    assert abs(frac - expected) < 0.05, (frac, expected)

    # Electrons were created into the target species, co-located with ions
    ew = np.asarray(sim.state.species[elec._index].w)
    n_elec = (ew != 0).sum()
    n_ionized = (lev[live] >= 1).sum()
    assert n_elec == n_ionized

    # Ionized deposition weight: rho of the ion species scales with level
    rho_ions = sim.deposit_single_species_rho(atoms)
    assert rho_ions[0].real.max() > 0  # positive charge proportional to level


if __name__ == "__main__":
    test_adk_rate_static_field()
