"""a0=4 blowout stress test: sorted-deposit column overflow must be
DETECTED in-jit and auto-repaired, never silent (VERDICT r2 #5).

The blowout density spike compresses z columns by factors well beyond
the 1.5x initial-occupancy auto-sizing margin; build_column_sort
counts every dropped slot into SimState.sort_overflow and
Simulation._consume_overflow_counters warns + auto-bumps sort_K
(recompile) after the chunk.
"""
import warnings

import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser


def _make(sort_K):
    Nz, Nr, Nm = 160, 20, 2
    zmax, zmin, rmax = 10.e-6, -6.e-6, 15.e-6
    dt = (zmax - zmin) / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin=0.e-6, p_zmax=500.e-6, p_rmin=0.,
                     p_rmax=10.e-6, p_nz=1, p_nr=1, p_nt=4, n_e=1.e25,
                     zmin=zmin, n_order=32,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0, verbose_level=0)
    import dataclasses
    sim.species_configs[0] = dataclasses.replace(
        sim.species_configs[0], sort_K=sort_K)
    sim.use_fused_deposit = True
    add_laser_pulse(sim, GaussianLaser(a0=4.0, waist=5.e-6,
                                       tau=8.e-15, z0=-1.e-6))
    sim.set_moving_window(v=c)
    return sim


def test_blowout_overflow_detected_and_autobumped():
    # Initial max column occupancy is ~56 (13 radial rings x 4 p_nt);
    # K=64 leaves only 1.14x headroom, which the blowout spike exceeds
    sim = _make(sort_K=64)
    K0 = sim.species_configs[0].sort_K
    bumped = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(10):
            sim.step(25, show_progress=False)
            if any("sorted-deposit capacity" in str(w.message)
                   for w in caught):
                bumped = True
                break
    assert bumped, "blowout never triggered the in-jit overflow counter"
    assert sim.species_configs[0].sort_K > K0

    # After the auto-bump(s), further chunks run clean (the bump loop
    # may fire more than once while the spike keeps compressing)
    for _ in range(6):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            sim.step(25, show_progress=False)
        if not any("sorted-deposit capacity" in str(w.message)
                   for w in caught):
            return
    pytest.fail("auto-bump never converged to a clean chunk")


def test_blowout_no_silent_loss_vs_scatter():
    """With ample K the fused blowout run must match the scatter run:
    the compression itself loses nothing.

    150 steps of a0=4 blowout amplify deposit-order roundoff (~1e-15)
    through the nonlinear dynamics to ~1e-6 pointwise (measured), so
    the pointwise tolerance is 3e-5; actual charge LOSS would show as
    macroparticle-sized deficits ~1e-2 of the density spike and as a
    total-weight mismatch, both asserted much tighter."""
    def run(fused):
        sim = _make(sort_K=768 if fused else 0)
        sim.use_fused_deposit = fused
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            sim.step(150, show_progress=False)
        assert not any("sorted-deposit capacity" in str(w.message)
                       for w in caught)
        w_tot = float(np.sum(np.asarray(sim.state.species[0].w)))
        return np.asarray(sim.get_interp_field("rho", 0).real), w_tot

    a, wa = run(False)
    b, wb = run(True)
    assert wa > 0
    # The particle sets are identical up to roundoff-divergent removal
    # of edge stragglers
    assert abs(wa - wb) < 1e-6 * wa
    scale = np.abs(a).max()
    assert scale > 0
    assert np.abs(a - b).max() < 3e-5 * scale


def test_blowout_overflow_resident_autobump():
    """The same a0=4 blowout stress with a RESIDENT species (lazy
    re-sort on): a resident column overflow permanently LOSES the
    excess particles for the chunk, so detection + the row-aware
    capacity reallocation (capacity == Nz * sort_K must survive the
    bump) is load-bearing, not just a perf issue (VERDICT r3 weak #3b:
    the bump used to crash the next chunk on the capacity assert)."""
    import dataclasses

    Nz, Nr, Nm = 160, 20, 2
    zmax, zmin, rmax = 10.e-6, -6.e-6, 15.e-6
    dt = (zmax - zmin) / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=zmin, n_order=32,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0, verbose_level=0)
    sim.use_fused_deposit = True
    # K=96: the smallest lane-multiple that still holds the initial
    # particle load (capacity = Nz*K >= Ntot), ~1.8x the initial max
    # column occupancy -- the blowout spike exceeds it within a few
    # hundred steps
    sim.add_new_species(q=-1.602e-19, m=9.109e-31, n=1.e25,
                        p_zmin=0.e-6, p_zmax=500.e-6, p_rmin=0.,
                        p_rmax=10.e-6, p_nz=1, p_nr=1, p_nt=4,
                        continuous_injection=True, sort_K=96)
    sc = sim.species_configs[0]
    assert sc.resident
    add_laser_pulse(sim, GaussianLaser(a0=4.0, waist=5.e-6,
                                       tau=8.e-15, z0=-1.e-6))
    sim.set_moving_window(v=c)

    K0 = sc.sort_K
    bumped = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(10):
            sim.step(25, show_progress=False)
            if any("sorted-deposit capacity" in str(w.message)
                   for w in caught):
                bumped = True
                break
    assert bumped, "blowout never overflowed the resident columns"
    sc = sim.species_configs[0]
    assert sc.sort_K > K0
    assert sc.resident, "bump must keep residency"
    assert sim.state.species[0].capacity == sim.config.Nz * sc.sort_K

    # Further chunks recompile with the bigger K and run clean
    for _ in range(6):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            sim.step(25, show_progress=False)
        if not any("sorted-deposit capacity" in str(w.message)
                   for w in caught):
            return
    pytest.fail("resident auto-bump never converged to a clean chunk")
