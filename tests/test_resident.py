"""Resident column-padded layout: the production TPU fast path.

Resident species (SpeciesConfig.resident, set by add_new_species when
fused deposition is on and capacity == Nz * sort_K) are stored in the
flattened (Nz, K) sort layout: one sort at the start of each step, the
field gather becomes an MXU contraction (gather_fields_sorted), and the
re-flattened padded arrays become the next state.  These tests pin:

- the flag is actually set through add_new_species (r3 shipped the path
  with zero tests constructing it this way, and it crashed at HEAD);
- physics parity vs the non-resident scatter path (f64, tight gate);
- tracking ids follow the per-step permutation (advisor r3 high #2);
- the sort_K auto-bump reallocates a resident species' arrays so
  capacity == Nz * sort_K stays true (advisor r3 medium).
"""
import dataclasses
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import e, m_e


def _make(resident, Nz=48, track=False, uz_m=0.05):
    Nr, Nm = 16, 2
    Lz, rmax = 20.e-6, 15.e-6
    dt = Lz / Nz / 3.e8
    sim = Simulation(Nz, Lz, Nr, rmax, Nm, dt, zmin=0.,
                     boundaries={"z": "periodic", "r": "reflective"},
                     random_seed=0, verbose_level=0)
    sim.use_fused_deposit = resident
    dens = lambda z, r: 1. + 0.05 * np.sin(2 * np.pi * z / Lz)
    sp = sim.add_new_species(q=-e, m=m_e, n=1.e24, dens_func=dens,
                             p_nz=2, p_nr=2, p_nt=4, uz_m=uz_m,
                             p_zmin=0., p_zmax=Lz, p_rmax=12.e-6,
                             sort_K=256 if resident else 0)
    if track:
        sp.track()
    return sim, sp


def test_resident_flag_set_through_add_new_species():
    sim, _ = _make(resident=True)
    sc = sim.species_configs[0]
    assert sc.resident, "add_new_species(sort_K=...) with fused " \
        "deposition must produce a resident species"
    assert sim.state.species[0].capacity == sim.config.Nz * sc.sort_K
    # and the step function actually selects the resident branch
    from fbpic_tpu.core.step import _resident_indices
    idx = _resident_indices(sim.config, tuple(sim.species_configs),
                            sim.build_options(), None)
    assert 0 in idx


def test_resident_matches_scatter_physics():
    """10 periodic plasma-wave steps: resident vs scatter Ez to 1e-9."""
    def run(resident):
        sim, _ = _make(resident)
        sim.step(10, show_progress=False)
        return np.asarray(sim.state.interp.Ez.re)

    a = run(False)
    b = run(True)
    scale = np.max(np.abs(a))
    assert scale > 0
    assert np.max(np.abs(a - b)) < 1e-9 * scale


def test_resident_ids_follow_particles():
    """Tracking ids must ride the per-step resident permutation.

    Both runs integrate identical physics in f64, so each tracked id
    must sit at (nearly) the same phase-space point in the resident and
    the scatter run -- a mis-permuted id array shows up as O(cell)
    position mismatches immediately.
    """
    def run(resident):
        sim, sp = _make(resident, track=True)
        sim.step(10, show_progress=False)
        st = sim.state.species[0]
        w = np.asarray(st.w)
        live = w != 0
        ids = (np.asarray(st.ids_hi).astype(np.uint64) << np.uint64(32)
               | np.asarray(st.ids).astype(np.uint64))
        return ids[live], np.asarray(st.z)[live], np.asarray(st.uz)[live]

    ia, za, ua = run(False)
    ib, zb, ub = run(True)
    assert len(ia) == len(ib)
    assert len(np.unique(ib)) == len(ib), "duplicate ids after resident"
    oa, ob = np.argsort(ia), np.argsort(ib)
    assert np.array_equal(ia[oa], ib[ob])
    dz_tol = 1e-9 * np.max(np.abs(za))
    assert np.max(np.abs(za[oa] - zb[ob])) < dz_tol
    assert np.max(np.abs(ua[oa] - ub[ob])) < 1e-6 * max(
        np.max(np.abs(ua)), 1e-30)


def test_resident_ids_invariant_for_static_particles():
    """Zero-momentum particles do not move; after several resident
    steps (each of which re-sorts the storage) every id must still map
    to its original position."""
    sim, sp = _make(resident=True, uz_m=0.0)
    sp.track()
    st0 = sim.state.species[0]
    w0 = np.asarray(st0.w)
    ids0 = (np.asarray(st0.ids_hi).astype(np.uint64) << np.uint64(32)
            | np.asarray(st0.ids).astype(np.uint64))
    pos0 = {int(i): (float(x), float(y), float(z))
            for i, x, y, z, w in zip(ids0, np.asarray(st0.x),
                                     np.asarray(st0.y),
                                     np.asarray(st0.z), w0) if w != 0}
    sim.step(5, show_progress=False)
    st = sim.state.species[0]
    w = np.asarray(st.w)
    ids = (np.asarray(st.ids_hi).astype(np.uint64) << np.uint64(32)
           | np.asarray(st.ids).astype(np.uint64))
    checked = 0
    for i, x, y, z, wi in zip(ids, np.asarray(st.x), np.asarray(st.y),
                              np.asarray(st.z), w):
        if wi == 0:
            continue
        x0, y0, z0 = pos0[int(i)]
        # plasma-wave fields from the particles' own charge move them
        # by far less than a thousandth of a cell over 5 short steps
        tol = 1e-3 * sim.config.dz
        assert abs(x - x0) < tol and abs(y - y0) < tol \
            and abs(z - z0) < tol, f"id {int(i)} jumped"
        checked += 1
    assert checked == len(pos0)


def test_resident_autobump_reallocates():
    """Column overflow on a resident species must auto-bump sort_K AND
    grow the arrays (capacity == Nz * sort_K), then keep running."""
    sim, _ = _make(resident=True)
    sc0 = sim.species_configs[0]
    assert sc0.resident
    Nz = sim.config.Nz
    # Compress every particle into a handful of columns so the very
    # first sort overflows K
    st = sim.state.species[0]
    z = np.asarray(st.z)
    z_sq = (np.mod(z, 2 * sim.config.dz)
            + 5 * sim.config.dz)
    sim.state = dataclasses.replace(
        sim.state, species=(dataclasses.replace(
            st, z=jnp.asarray(z_sq, st.z.dtype)),))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sim.step(1, show_progress=False)
    assert any("sorted-deposit capacity" in str(w.message)
               for w in caught), "overflow not detected"
    sc1 = sim.species_configs[0]
    assert sc1.sort_K > sc0.sort_K
    assert sc1.resident
    assert sim.state.species[0].capacity == Nz * sc1.sort_K
    # the next chunk must run (this used to die on the capacity assert)
    sim.step(2, show_progress=False)


if __name__ == "__main__":
    test_resident_flag_set_through_add_new_species()
    test_resident_matches_scatter_physics()
    test_resident_ids_follow_particles()
    test_resident_ids_invariant_for_static_particles()
    test_resident_autobump_reallocates()


def test_banded_resort_matches_full_sort():
    """The banded per-step re-sort (one batched row-wise sort over the
    neighbor rows of the stored layout) must match the full flat sort
    physics -- the per-particle contributions are identical, only the
    intra-column particle ORDER may differ (f64 gate well above
    order-rounding).  Also pins that zero particles are lost to the
    band (sort_overflow stays 0)."""
    def run(resort):
        sim, _ = _make(resident=True, uz_m=0.3)
        sim.species_configs[0] = dataclasses.replace(
            sim.species_configs[0], resort=resort)
        assert sim.species_configs[0].resort == resort
        sim.step(10, show_progress=False)
        return np.asarray(sim.state.interp.Ez.re)

    a = run("full")
    b = run("banded")
    scale = np.max(np.abs(a))
    assert scale > 0
    err = np.max(np.abs(a - b)) / scale
    print("banded-resort parity:", err)
    assert err < 1e-9


def test_banded_resort_moving_window():
    """Banded re-sort under a moving window: every shift rolls the
    stored rows (cancelling the n_move relabeling so the band only
    covers physical motion), injection/exchange steps fall back to the
    full flat sort, and the open-z removal keeps the wrapped rows dead.
    Full production mechanics on a small LWFA config, f64, vs the
    full-sort-every-step run."""
    from fbpic_tpu.constants import c
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    NZ_PHYS, NR, NM = 130, 16, 2
    ZMAX, ZMIN, RMAX = 12.e-6, -4.e-6, 10.e-6
    dz = (ZMAX - ZMIN) / NZ_PHYS
    dt = dz / c

    def run(resort):
        sim = Simulation(
            NZ_PHYS, ZMAX, NR, RMAX, NM, dt, zmin=ZMIN,
            n_order=16, boundaries={"z": "open", "r": "reflective"},
            exchange_period=4, random_seed=0, verbose_level=0)
        sim.use_fused_deposit = True
        sim.add_new_species(q=-e, m=m_e, n=5.e24,
                            p_zmin=2.e-6, p_zmax=100.e-6, p_rmin=0.,
                            p_rmax=9.e-6, p_nz=1, p_nr=2, p_nt=4,
                            continuous_injection=True, sort_K=256)
        add_laser_pulse(sim, GaussianLaser(a0=0.5, waist=4.e-6,
                                           tau=8.e-15, z0=6.e-6))
        sim.set_moving_window(v=c)
        sc = sim.species_configs[0]
        assert sc.resident, "sort_K + fused must produce residency"
        sim.species_configs[0] = dataclasses.replace(sc, resort=resort)
        sim.step(40, show_progress=False)
        return np.asarray(sim.state.interp.Ez.re)

    a = run("full")
    b = run("banded")
    scale = np.max(np.abs(a))
    assert scale > 0
    err = np.max(np.abs(a - b)) / scale
    print("banded-resort moving-window parity:", err)
    assert err < 1e-9


def test_resident_on_mesh_lwfa_parity():
    """Resident fast path on a 4-device z mesh (VERDICT r4 #4: the
    mesh used to silently fall back to the non-resident machinery).
    Full production mechanics -- banded per-step re-sort between
    exchanges, full re-sort on the migration/injection steps, window
    row roll, dead-slot injection -- decomposed over 4 devices, vs the
    single-chip resident run."""
    import jax
    import pytest
    from fbpic_tpu.constants import c
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
    from fbpic_tpu.parallel.api import distribute_simulation

    N_DEV = 4
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs %d devices" % N_DEV)

    NZ_PHYS, NR, NM = 130, 16, 2
    ZMAX, ZMIN, RMAX = 12.e-6, -4.e-6, 10.e-6
    dz = (ZMAX - ZMIN) / NZ_PHYS
    dt = dz / c
    N_STEPS = 40

    def build():
        sim = Simulation(
            NZ_PHYS, ZMAX, NR, RMAX, NM, dt, zmin=ZMIN,
            n_order=16, boundaries={"z": "open", "r": "reflective"},
            exchange_period=4, random_seed=0, verbose_level=0)
        sim.use_fused_deposit = True
        sim.add_new_species(q=-e, m=m_e, n=5.e24,
                            p_zmin=2.e-6, p_zmax=100.e-6, p_rmin=0.,
                            p_rmax=9.e-6, p_nz=1, p_nr=2, p_nt=4,
                            continuous_injection=True, sort_K=256)
        add_laser_pulse(sim, GaussianLaser(a0=0.5, waist=4.e-6,
                                           tau=8.e-15, z0=6.e-6))
        sim.set_moving_window(v=c)
        assert sim.species_configs[0].resident
        assert sim.species_configs[0].resort == "banded"
        return sim

    from fbpic_tpu.fields import transform as tr
    sim1 = build()
    sim1.step(N_STEPS, show_progress=False)
    Ez1 = tr.spect2interp_scal(sim1.aux.mats,
                               sim1.state.spect.Ez).to_numpy()[0]

    sim4 = build()
    if sim4.config.Nz % N_DEV != 0:
        pytest.skip("internal Nz=%d not divisible by %d"
                    % (sim4.config.Nz, N_DEV))
    # n_guard=24 keeps the mesh's guard-clamped exchange period at 4,
    # matching the single-chip injection/removal schedule
    run = distribute_simulation(sim4, n_devices=N_DEV, n_guard=24)
    assert 0 in run._resident_idx, \
        "mesh run must keep the resident fast path"
    run.step(N_STEPS)
    Ez4 = run.get_interp_field("Ez", m=0)

    scale = np.abs(Ez1).max()
    assert scale > 0
    err = np.abs(Ez4 - Ez1).max() / scale
    print("mesh-resident LWFA max rel deviation:", err)
    # same gate as the non-resident mesh LWFA test: the deviation is
    # the per-slab current-correction locality
    assert err < 5e-3


def test_banded_resort_clamps_knife_edge_escapees():
    """A particle whose recomputed column is band+1 rows from its
    stored row (the f32 knife edge: col = floor(invdz*(z - zmin))
    recomputed against a moving zmin is only ~ULP(Nz)-reproducible)
    must be CLAMPED into the nearest in-band row, not dropped: without
    the clamp the n_over>0 full-sort fallback in core/step fired
    nearly every step at production size (8.7 ms/step hidden flat
    sort, r5).  Checks both zfolds, both escape directions, weight
    conservation, and that in-band particles still sort exactly."""
    from fbpic_tpu.particles.sorted_deposit import banded_column_resort

    Nz, K, band = 12, 4, 1
    dz = 1.0
    rng = np.random.RandomState(3)

    for zfold in ("periodic", "clamp"):
        # Exact column sort: row i holds 2 live particles at z in cell i
        z = np.zeros((Nz, K))
        w = np.zeros((Nz, K))
        for i in range(Nz):
            z[i, :2] = i + rng.uniform(0.2, 0.8, 2)
            w[i, :2] = 1.0
        # Escapees: stored in row 5 / row 8 but physically 2 cells away
        z[5, 2] = 5 + 2 + 0.5     # col = 7 = row + band + 1
        w[5, 2] = 3.0
        z[8, 2] = 8 - 2 + 0.5     # col = 6 = row - band - 1
        w[8, 2] = 5.0
        x = rng.rand(Nz, K)
        padded = (x, x.copy(), z, w)
        out = banded_column_resort(
            tuple(jnp.asarray(a) for a in padded), 0.0, 1.0 / dz,
            Nz, K, band, zfold=zfold)
        assert int(out["n_over"]) == 0, zfold
        w2 = np.asarray(out["padded"][3])
        z2 = np.asarray(out["padded"][2])
        valid = np.asarray(out["valid"])
        # Weight conserved (nothing dropped)
        np.testing.assert_allclose(np.sum(w2[valid]), np.sum(w), rtol=0)
        # The forward escapee sits in its nearest in-band row (6),
        # the backward one in row 7
        assert 3.0 in w2[5 + band][valid[5 + band]], zfold
        assert 5.0 in w2[8 - band][valid[8 - band]], zfold
        # Every in-band particle is in its exact column
        col2 = np.floor(z2).astype(int)
        row = np.arange(Nz)[:, None] * np.ones((1, K), int)
        inband = valid & (w2 != 3.0) & (w2 != 5.0)
        np.testing.assert_array_equal(col2[inband], row[inband])
