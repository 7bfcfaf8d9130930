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
    log_pref = float(aux.adk_log_prefactor[level])
    power = float(aux.adk_power[level])
    exp_pref = float(aux.adk_exp_prefactor[level])
    w_dtau = np.exp(log_pref + power * np.log(E_field)
                    + exp_pref / E_field)
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


def test_full_atomic_table():
    """The embedded NIST table must cover every level of every listed
    element (the reference parses the same data:
    read_atomic_data.py:14-107)."""
    from fbpic_tpu.particles.ionization import get_ionization_energies
    expected_levels = {"H": 1, "He": 2, "N": 7, "Ar": 18, "Kr": 36,
                       "Xe": 54, "Rb": 37, "Rn": 86}
    for el, n in expected_levels.items():
        en = get_ionization_energies(el)
        assert en is not None and len(en) == n, (el, len(en))
        assert np.all(np.diff(en) > 0) or el in ("Rb",), el
    assert get_ionization_energies("Unknownium") is None


def test_chen2013_n5_fraction():
    """Chen JCP 2013 fig. 2: an a0=1.8 Gaussian laser through Nitrogen
    (starting at N2+) leaves ~1/3 of the atoms in the N5+ state.

    External physics benchmark, mirroring
    /root/reference/tests/test_ionization.py (lab-frame case, with the
    laser as a prescribed external field and separate per-level
    electron species)."""
    import jax.numpy as jnp
    import math

    zmin_lab, zmax_lab = 0.e-6, 20.e-6
    Nr, rmax, Nm = 3, 10.e-6, 2
    p_zmin, p_zmax = 5.e-6, 15.e-6
    p_rmin, p_rmax = 0., 100.e-6
    n_atoms = 0.2
    p_nz, p_nr, p_nt = 2, 1, 4

    a0 = 1.8
    lambda0 = 0.8e-6
    ctau = 10. * lambda0
    z0 = -2 * ctau
    omega = 2 * np.pi * c / lambda0
    E0 = a0 * m_e * c * omega / e
    B0 = E0 / c

    def laser_func(F, x, y, z, t, amplitude, length_scale):
        return F + amplitude * jnp.cos(2 * np.pi * (z - c * t) / lambda0) \
            * jnp.exp(-((z - c * t - z0) ** 2) / ctau**2)

    dz = lambda0 / 16.
    dt = dz / c
    Nz = int((zmax_lab - zmin_lab) / dz) + 1
    N_step = int((2. * 40. * lambda0 + zmax_lab - zmin_lab) / dz) + 1

    level_start = 2
    sim = Simulation(Nz, zmax_lab, Nr, rmax, Nm, dt, zmin=zmin_lab,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    elec = sim.add_new_species(q=-e, m=m_e, n=level_start * n_atoms,
                               p_nz=p_nz, p_nr=p_nr, p_nt=p_nt,
                               p_zmin=p_zmin, p_zmax=p_zmax,
                               p_rmin=p_rmin, p_rmax=p_rmax,
                               continuous_injection=False)
    ions = sim.add_new_species(q=0, m=14. * m_p, n=n_atoms,
                               p_nz=p_nz, p_nr=p_nr, p_nt=p_nt,
                               p_zmin=p_zmin, p_zmax=p_zmax,
                               p_rmin=p_rmin, p_rmax=p_rmax,
                               continuous_injection=False)
    # One electron species per ionizable level (N2+ .. N5+)
    level_max = 6
    targets = {lvl: sim.add_new_species(q=-e, m=m_e, capacity=65536,
                                        continuous_injection=False)
               for lvl in range(level_start, level_max)}
    ions.make_ionizable(element="N", level_start=level_start,
                        level_max=level_max, target_species=targets)
    sim.external_fields = [
        ExternalField(laser_func, "Ex", E0, 0.),
        ExternalField(laser_func, "By", B0, 0.)]

    sim.step(N_step, use_true_rho=True, show_progress=False)

    w = np.asarray(sim.state.species[ions._index].w)
    lev = np.asarray(sim.state.species[ions._index].ionization_level)
    live = w != 0
    ntot = w[live].sum()
    n_N5 = w[live & (lev == 5)].sum()
    frac = n_N5 / ntot
    print(f"N5+ fraction: {frac:.4f} (Chen 2013: ~0.32)")
    assert 0.30 < frac < 0.34

    # Per-level electron routing: each target species' weight equals
    # the weight of ions that passed through that level
    for lvl in range(level_start, level_max):
        tw = np.asarray(sim.state.species[targets[lvl]._index].w).sum()
        n_through = w[live & (lev > lvl)].sum()
        assert np.isclose(tw, n_through, rtol=1e-6), (lvl, tw, n_through)


if __name__ == "__main__":
    test_adk_rate_static_field()
    test_full_atomic_table()
    test_chen2013_n5_fraction()


def test_small_capacity_target_receives_electrons():
    """Regression: a default-capacity (empty) target species is smaller
    than the creation buffer; write_ring used to wrap within one append
    and the masked 'keep old' writes clobbered the new electrons
    nondeterministically.  make_ionizable now grows the target to hold
    one buffer, and every stripped level must land one electron.
    (Reference grows target arrays unboundedly:
    elementary_process/cuda_numba_utils.py:60-120.)"""
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    Nz, Nr, Nm = 120, 24, 2
    zmax, zmin, rmax = 15.e-6, -5.e-6, 10.e-6
    dt = (zmax - zmin) / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=zmin,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0, verbose_level=0)
    ion = sim.add_new_species(q=5 * e, m=14. * m_p, n=1.e23,
                              p_zmin=2.e-6, p_zmax=12.e-6,
                              p_rmax=8.e-6, p_nz=2, p_nr=2, p_nt=4)
    elec_from_N = sim.add_new_species(q=-e, m=m_e)   # default capacity
    ion.make_ionizable("N", target_species=elec_from_N, level_start=5)
    assert sim.state.species[elec_from_N._index].capacity >= 8192
    add_laser_pulse(sim, GaussianLaser(a0=2., waist=4.e-6, tau=10.e-15,
                                       z0=0.))
    sim.step(60, show_progress=False)

    lev = np.asarray(sim.state.species[ion._index].ionization_level)
    w_i = np.asarray(sim.state.species[ion._index].w)
    levels_gained = int((lev[w_i != 0] - 5).sum())
    w_e = np.asarray(sim.state.species[elec_from_N._index].w)
    n_new = int((w_e != 0).sum())
    assert levels_gained > 20      # the laser must strip some N5+
    assert n_new == levels_gained, (n_new, levels_gained)
