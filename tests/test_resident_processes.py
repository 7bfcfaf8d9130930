"""Resident fast path for process-carrying species (r5; VERDICT r4 #3).

Ionizer / Compton species and their append targets used to fall off
the resident column-padded layout (3.7x slower at the ionization LWFA
benchmark).  Now the process runs INSIDE the resident block between
the push and the deposit, ionization_level rides the sort as an
integer payload channel, and newborns land in dead slots of their own
z row (_append_into_padded) with their birth-step J/rho contributions
scatter-deposited onto the fused grids.

These tests pin: the ADK rate on the resident path (same prescribed
static field harness as test_ionization.py), the exact cross-species
creation invariants (electron count == level increments, weights
inherited), id uniqueness through the row-aware append, and that the
species actually run resident.
"""
import dataclasses

import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e, m_p
from fbpic_tpu.lpa_utils.external_fields import ExternalField
from fbpic_tpu.particles.ionization import build_ionizer_aux


def _adk_probability(element, level, E_field, dt):
    aux, _ = build_ionizer_aux(element, dt)
    log_pref = float(aux.adk_log_prefactor[level])
    power = float(aux.adk_power[level])
    exp_pref = float(aux.adk_exp_prefactor[level])
    w_dtau = np.exp(log_pref + power * np.log(E_field)
                    + exp_pref / E_field)
    return 1.0 - np.exp(-w_dtau)


def _build(resident):
    Nz, Nr, Nm = 16, 8, 1
    zmax, rmax = 1.6e-6, 2.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, random_seed=3,
                     verbose_level=0)
    sim.use_fused_deposit = resident
    atoms = sim.add_new_species(
        q=e, m=m_p, n=1e20, p_nz=4, p_nr=4, p_nt=4,
        p_zmin=0, p_zmax=zmax, p_rmin=0, p_rmax=1.5e-6,
        continuous_injection=False, sort_K=512 if resident else 0)
    elec = sim.add_new_species(
        q=-e, m=m_e, continuous_injection=False,
        capacity=None if resident else 65536,
        sort_K=512 if resident else 0)
    atoms.make_ionizable("H", elec, level_start=0)
    elec.track()
    E0 = 3.2e10

    def field_func(F, x, y, z, t, amplitude, length_scale):
        return F + amplitude

    sim.external_fields.append(
        ExternalField(field_func, "Ex", E0, 0.0, species=atoms))
    return sim, atoms, elec, E0, dt


def test_resident_ionization_adk_rate():
    """The prescribed-static-field ADK harness of test_ionization.py,
    on the RESIDENT path: ionized fraction matches 1-(1-p)^N, every
    creation lands in the target (exact count + weight invariants),
    newborns are co-located with their parent column, ids unique."""
    sim, atoms, elec, E0, dt = _build(resident=True)

    # the species must actually run resident
    from fbpic_tpu.core.step import _resident_indices
    idx = _resident_indices(sim.config, tuple(sim.species_configs),
                            sim.build_options(correct_currents=False),
                            None)
    assert atoms._index in idx and elec._index in idx

    p_step = _adk_probability("H", 0, E0, dt)
    N = 20
    sim.step(N, correct_currents=False, show_progress=False)

    ion_st = sim.state.species[atoms._index]
    lev = np.asarray(ion_st.ionization_level)
    w = np.asarray(ion_st.w)
    live = w != 0
    frac = (lev[live] >= 1).mean()
    expected = 1.0 - (1.0 - p_step) ** N
    assert abs(frac - expected) < 0.05, (frac, expected)

    # exact creation invariants across the row-aware append
    el_st = sim.state.species[elec._index]
    ew = np.asarray(el_st.w)
    n_elec = int((ew != 0).sum())
    n_ionized = int((lev[live] >= 1).sum())
    assert n_elec == n_ionized
    # total created weight == sum of ion weights per level increment
    w_created = ew[ew != 0].sum()
    w_expected = (w[live] * lev[live]).sum()
    assert abs(w_created - w_expected) < 1e-9 * max(w_expected, 1e-30)
    # nothing dropped (loud counters stay 0; step() would warn)
    assert sim.state.sort_overflow is None or \
        int(np.asarray(sim.state.sort_overflow)) == 0

    # ids unique through _append_into_padded
    ids = np.asarray(el_st.ids)[ew != 0]
    if el_st.ids_hi is not None:
        ids = (np.asarray(el_st.ids_hi)[ew != 0].astype(np.uint64)
               << np.uint64(32)) | ids.astype(np.uint64)
    assert len(np.unique(ids)) == n_elec

    # electrons live inside the ion region (row-aware placement kept
    # them at their birth positions +- one push)
    ez = np.asarray(el_st.z)[ew != 0]
    assert ez.min() >= -0.1e-6 and ez.max() <= 1.7e-6


def test_resident_ionization_matches_scatter_rate():
    """Resident vs non-resident ionization: same config, same number
    of steps -- the ionized fractions agree statistically (different
    RNG-to-particle pairing, same physics) and both match ADK."""
    fracs = {}
    for resident in (False, True):
        sim, atoms, elec, E0, dt = _build(resident)
        sim.step(20, correct_currents=False, show_progress=False)
        st = sim.state.species[atoms._index]
        lev = np.asarray(st.ionization_level)
        live = np.asarray(st.w) != 0
        fracs[resident] = (lev[live] >= 1).mean()
    assert abs(fracs[True] - fracs[False]) < 0.05, fracs


def test_resident_ionization_deposit_weight():
    """The ion deposit on the resident path must be weighted by the
    POST-ionization level (the process runs before the deposit, the
    reference order): after full single-level ionization the ion rho
    must equal the level-1 charge density."""
    sim, atoms, elec, E0, dt = _build(resident=True)
    # crank the field so ionization saturates fast
    sim.external_fields[0] = ExternalField(
        lambda F, x, y, z, t, amplitude, length_scale: F + amplitude,
        "Ex", 8e10, 0.0, species=atoms)
    sim.step(12, correct_currents=False, show_progress=False)
    st = sim.state.species[atoms._index]
    lev = np.asarray(st.ionization_level)
    live = np.asarray(st.w) != 0
    assert (lev[live] >= 1).all(), "field too weak to saturate"
    rho = sim.deposit_single_species_rho(sim.ptcl[atoms._index])
    assert np.asarray(rho[0].real).max() > 0
