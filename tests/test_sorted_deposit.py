"""Sorted dense (MXU) deposition must match the scatter deposition.

The sorted path (sorted_deposit.py, opt-in via SpeciesConfig.sort_K)
replaces the scatter-add with an argsort + padded one-hot einsum; both
compute identical shape factors, so they agree to roundoff -- including
out-of-range particles (edge mask), dead particles (w = 0), periodic
wrap, and up to half a cell of drift between the sort and the deposit.
"""
import numpy as np
import jax.numpy as jnp

from fbpic_tpu import Simulation
from fbpic_tpu.particles import deposit as dd
from fbpic_tpu.particles import sorted_deposit as sd


def test_sorted_matches_scatter():
    rng = np.random.RandomState(3)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12, zmin=zmin)
    ruy = sim.aux.ruyten_linear

    Np = 5000
    z = zmin + rng.uniform(-0.2, Nz * dz + 0.2, Np)
    r = rng.uniform(0, Nr * dr * 0.99, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    w[rng.rand(Np) < 0.1] = 0.0
    ux, uy, uz = rng.randn(3, Np) * 0.3
    ig = 1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)

    for zfold in ("clamp", "periodic"):
        zz = zmin + np.mod(z - zmin, Nz * dz) if zfold == "periodic" else z
        xj, yj, zj, wj = map(jnp.asarray, (x, y, zz, w))
        sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=640)
        # emulate up to dz/2 drift between sort and deposit
        zz2 = zz + rng.uniform(-dz / 2, dz / 2, Np)
        if zfold == "periodic":
            zz2 = zmin + np.mod(zz2 - zmin, Nz * dz)
        zj2 = jnp.asarray(zz2)

        a = dd.deposit_rho_linear(xj, yj, zj2, wj, -1.6e-19, Nm, 1 / dz,
                                  zmin, Nz, 1 / dr, 0., Nr, ruy, zfold=zfold)
        b = sd.deposit_rho_sorted(sort, xj, yj, zj2, wj, -1.6e-19, Nm,
                                  1 / dz, zmin, Nz, 1 / dr, 0., Nr, ruy,
                                  zfold=zfold)
        scale = np.max(np.abs(a.re))
        assert np.max(np.abs(a.re - b.re)) < 1e-12 * scale
        assert np.max(np.abs(a.im - b.im)) < 1e-12 * scale

        args = (xj, yj, zj, wj, -1.6e-19, jnp.asarray(ux), jnp.asarray(uy),
                jnp.asarray(uz), jnp.asarray(ig), Nm, 1 / dz, zmin, Nz,
                1 / dr, 0., Nr, ruy)
        aJ = dd.deposit_J_linear(*args, zfold=zfold)
        bJ = sd.deposit_J_sorted(sort, *args, zfold=zfold)
        for A, B in zip(aJ, bJ):
            scale = np.max(np.abs(A.re))
            assert np.max(np.abs(A.re - B.re)) < 1e-12 * scale
            assert np.max(np.abs(A.im - B.im)) < 1e-12 * scale


def test_fused_rho_J_matches_scatter():
    """deposit_rho_J_sorted (the production TPU deposition) must match
    the two scatter passes: J at the sort positions, rho one exact
    half-push later."""
    from fbpic_tpu.constants import c
    rng = np.random.RandomState(7)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12, zmin=zmin)
    ruy = sim.aux.ruyten_linear

    Np = 5000
    z = zmin + rng.uniform(0.0, Nz * dz, Np)
    r = rng.uniform(0, Nr * dr * 0.99, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    w[rng.rand(Np) < 0.1] = 0.0
    ux, uy, uz = rng.randn(3, Np) * 0.5
    ig = 1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    dt_half = 0.25 * dz / c
    q = -1.6e-19

    for zfold in ("clamp", "periodic"):
        xj, yj, zj, wj = map(jnp.asarray, (x, y, z, w))
        uxj, uyj, uzj, igj = map(jnp.asarray, (ux, uy, uz, ig))
        sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=640)
        Jr, Jt, Jz, rho = sd.deposit_rho_J_sorted(
            sort, xj, yj, zj, wj, q, uxj, uyj, uzj, igj, dt_half,
            Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr, ruy, zfold=zfold)

        aJ = dd.deposit_J_linear(xj, yj, zj, wj, q, uxj, uyj, uzj, igj,
                                 Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr,
                                 ruy, zfold=zfold)
        chdt = c * dt_half
        x2, y2, z2 = (xj + chdt * igj * uxj, yj + chdt * igj * uyj,
                      zj + chdt * igj * uzj)
        a_rho = dd.deposit_rho_linear(x2, y2, z2, wj, q, Nm, 1 / dz,
                                      zmin, Nz, 1 / dr, 0., Nr, ruy,
                                      zfold=zfold)
        for A, B in zip(aJ + (a_rho,), (Jr, Jt, Jz, rho)):
            scale = np.max(np.abs(A.re))
            assert np.max(np.abs(A.re - B.re)) < 1e-12 * scale
            assert np.max(np.abs(A.im - B.im)) < 1e-12 * scale


def test_fused_step_matches_scatter_step():
    """A short periodic plasma-wave run with the fused sorted-dense
    deposition enabled must match the scatter-path run to roundoff."""
    import dataclasses
    from fbpic_tpu.constants import e, m_e

    def run(fused):
        Nz, Nr, Nm = 48, 16, 2
        Lz, rmax = 20.e-6, 15.e-6
        dt = Lz / Nz / 3.e8
        sim = Simulation(Nz, Lz, Nr, rmax, Nm, dt, zmin=0.,
                         boundaries={"z": "periodic", "r": "reflective"},
                         random_seed=0)
        sim.use_fused_deposit = fused
        dens = lambda z, r: 1. + 0.05 * np.sin(2 * np.pi * z / Lz)
        sim.add_new_species(q=-e, m=m_e, n=1.e24, dens_func=dens,
                            p_nz=2, p_nr=2, p_nt=4, uz_m=0.05,
                            p_zmin=0., p_zmax=Lz, p_rmax=12.e-6,
                            sort_K=256 if fused else 0)
        sim.step(10, show_progress=False)
        return np.asarray(sim.state.interp.Ez.re)

    a = run(False)
    b = run(True)
    scale = np.max(np.abs(a))
    assert scale > 0
    assert np.max(np.abs(a - b)) < 1e-9 * scale


if __name__ == "__main__":
    test_sorted_matches_scatter()
    test_fused_rho_J_matches_scatter()
    test_fused_step_matches_scatter_step()


def test_payload_sort_matches_idx_plan():
    """The production payload-through-sort plan must yield the same
    padded (Nz, K) channels as the legacy idx plan (lax.sort is stable,
    so ties keep particle order)."""
    rng = np.random.RandomState(5)
    Nz, K, Np = 32, 64, 1500
    dz, zmin = 0.1, -1.0
    z = zmin + rng.uniform(-0.2, Nz * dz + 0.2, Np)
    w = rng.uniform(0.5, 1.5, Np)
    w[rng.rand(Np) < 0.15] = 0.0
    chans = [rng.randn(Np) for _ in range(5)]
    zj, wj = jnp.asarray(z), jnp.asarray(w)
    cj = [jnp.asarray(cc) for cc in chans]

    legacy = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K)
    pl = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K,
                              payload=tuple(cj))
    ref = sd._padded_arrays(legacy, cj)
    new = sd._padded_arrays(pl, cj)
    assert np.array_equal(np.asarray(legacy["valid"]),
                          np.asarray(pl["valid"]))
    assert int(legacy["n_over"]) == int(pl["n_over"])
    valid = np.asarray(pl["valid"])
    for A, B in zip(ref, new):
        assert np.array_equal(np.asarray(A)[valid], np.asarray(B)[valid])


def test_fused_drho_matches_difference():
    """with_drho=True must reproduce rho(x_{n+1}) - rho(x_n) (f64:
    exact up to the radial-crosser approximation, negligible at
    production velocity scales)."""
    from fbpic_tpu.constants import c
    rng = np.random.RandomState(11)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12,
                     zmin=zmin, verbose_level=0)
    ruy = sim.aux.ruyten_linear

    Np = 5000
    z = zmin + rng.uniform(0.0, Nz * dz, Np)
    r = rng.uniform(0, Nr * dr * 0.99, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    # production-scale velocities: motion per half push << a cell
    ux, uy, uz = rng.randn(3, Np) * 0.005
    ig = 1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    dt_half = 0.25 * dz / c
    q = -1.6e-19

    xj, yj, zj, wj = map(jnp.asarray, (x, y, z, w))
    uxj, uyj, uzj, igj = map(jnp.asarray, (ux, uy, uz, ig))
    sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=640)
    out = sd.deposit_rho_J_sorted(
        sort, xj, yj, zj, wj, q, uxj, uyj, uzj, igj, dt_half,
        Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr, ruy, zfold="clamp",
        with_drho=True)
    drho = out[4]

    chdt = c * dt_half
    x2, y2, z2 = (xj + chdt * igj * uxj, yj + chdt * igj * uyj,
                  zj + chdt * igj * uzj)
    x0, y0, z0 = (xj - chdt * igj * uxj, yj - chdt * igj * uyj,
                  zj - chdt * igj * uzj)
    r2 = dd.deposit_rho_linear(x2, y2, z2, wj, q, Nm, 1 / dz, zmin, Nz,
                               1 / dr, 0., Nr, ruy, zfold="clamp")
    r0 = dd.deposit_rho_linear(x0, y0, z0, wj, q, Nm, 1 / dz, zmin, Nz,
                               1 / dr, 0., Nr, ruy, zfold="clamp")
    truth = r2 - r0
    s = np.abs(np.asarray(truth.re)).max()
    e = max(np.abs(np.asarray(drho.re - truth.re)).max(),
            np.abs(np.asarray(drho.im - truth.im)).max())
    # bounded by the radial-crosser approximation (O(depth^2) of the
    # incoherent per-cell signal at these random velocities; the
    # physics-level accuracy is validated end-to-end by test_f32_parity)
    assert e < 5e-2 * s


def test_fused_cubic_matches_scatter():
    """deposit_rho_J_sorted_cubic must match the cubic scatter passes:
    J at the sort positions, rho one exact half-push later."""
    from fbpic_tpu.constants import c
    rng = np.random.RandomState(13)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12,
                     zmin=zmin, verbose_level=0)
    ruy = sim.aux.ruyten_cubic

    Np = 5000
    z = zmin + rng.uniform(-0.2, Nz * dz + 0.2, Np)
    r = rng.uniform(0, Nr * dr * 0.99, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    w[rng.rand(Np) < 0.1] = 0.0
    ux, uy, uz = rng.randn(3, Np) * 0.5
    ig = 1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    dt_half = 0.25 * dz / c
    q = -1.6e-19

    for zfold in ("clamp", "periodic"):
        zz = zmin + np.mod(z - zmin, Nz * dz) if zfold == "periodic" else z
        xj, yj, zj, wj = map(jnp.asarray, (x, y, zz, w))
        uxj, uyj, uzj, igj = map(jnp.asarray, (ux, uy, uz, ig))
        sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=640)
        Jr, Jt, Jz, rho = sd.deposit_rho_J_sorted_cubic(
            sort, xj, yj, zj, wj, q, uxj, uyj, uzj, igj, dt_half,
            Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr, ruy, zfold=zfold)

        aJ = dd.deposit_J_cubic(xj, yj, zj, wj, q, uxj, uyj, uzj, igj,
                                Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr,
                                ruy, zfold=zfold)
        chdt = c * dt_half
        x2, y2, z2 = (xj + chdt * igj * uxj, yj + chdt * igj * uyj,
                      zj + chdt * igj * uzj)
        a_rho = dd.deposit_rho_cubic(x2, y2, z2, wj, q, Nm, 1 / dz,
                                     zmin, Nz, 1 / dr, 0., Nr, ruy,
                                     zfold=zfold)
        for A, B in zip(aJ + (a_rho,), (Jr, Jt, Jz, rho)):
            scale = np.max(np.abs(A.re))
            assert np.max(np.abs(A.re - B.re)) < 1e-12 * scale, zfold
            assert np.max(np.abs(A.im - B.im)) < 1e-12 * scale, zfold


def test_fused_cubic_drho_matches_difference():
    """Cubic with_drho=True reproduces rho(x_{n+1}) - rho(x_n)."""
    from fbpic_tpu.constants import c
    rng = np.random.RandomState(17)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12,
                     zmin=zmin, verbose_level=0)
    ruy = sim.aux.ruyten_cubic

    Np = 5000
    z = zmin + rng.uniform(0.0, Nz * dz, Np)
    r = rng.uniform(0, Nr * dr * 0.99, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    ux, uy, uz = rng.randn(3, Np) * 0.005
    ig = 1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
    dt_half = 0.25 * dz / c
    q = -1.6e-19

    xj, yj, zj, wj = map(jnp.asarray, (x, y, z, w))
    uxj, uyj, uzj, igj = map(jnp.asarray, (ux, uy, uz, ig))
    sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=640)
    out = sd.deposit_rho_J_sorted_cubic(
        sort, xj, yj, zj, wj, q, uxj, uyj, uzj, igj, dt_half,
        Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr, ruy, zfold="clamp",
        with_drho=True)
    drho = out[4]
    # The J channels of the joint contraction must still match scatter
    aJ = dd.deposit_J_cubic(xj, yj, zj, wj, q, uxj, uyj, uzj, igj,
                            Nm, 1 / dz, zmin, Nz, 1 / dr, 0., Nr,
                            ruy, zfold="clamp")
    for A, B in zip(aJ, out[:3]):
        scale = np.max(np.abs(A.re))
        assert np.max(np.abs(A.re - B.re)) < 1e-12 * scale

    chdt = c * dt_half
    x2, y2, z2 = (xj + chdt * igj * uxj, yj + chdt * igj * uyj,
                  zj + chdt * igj * uzj)
    x0, y0, z0 = (xj - chdt * igj * uxj, yj - chdt * igj * uyj,
                  zj - chdt * igj * uzj)
    r2 = dd.deposit_rho_cubic(x2, y2, z2, wj, q, Nm, 1 / dz, zmin, Nz,
                              1 / dr, 0., Nr, ruy, zfold="clamp")
    r0 = dd.deposit_rho_cubic(x0, y0, z0, wj, q, Nm, 1 / dz, zmin, Nz,
                              1 / dr, 0., Nr, ruy, zfold="clamp")
    truth = r2 - r0
    s = np.abs(np.asarray(truth.re)).max()
    err = max(np.abs(np.asarray(drho.re - truth.re)).max(),
              np.abs(np.asarray(drho.im - truth.im)).max())
    assert err < 5e-2 * s


def test_fused_cubic_step_matches_scatter_step():
    """A short periodic cubic-shape run with the fused sorted-dense
    deposition must match the cubic scatter-path run to roundoff."""
    from fbpic_tpu.constants import e, m_e

    def run(fused):
        Nz, Nr, Nm = 48, 16, 2
        Lz, rmax = 20.e-6, 15.e-6
        dt = Lz / Nz / 3.e8
        sim = Simulation(Nz, Lz, Nr, rmax, Nm, dt, zmin=0.,
                         boundaries={"z": "periodic", "r": "reflective"},
                         particle_shape="cubic", random_seed=0,
                         verbose_level=0)
        sim.use_fused_deposit = fused
        dens = lambda z, r: 1. + 0.05 * np.sin(2 * np.pi * z / Lz)
        sim.add_new_species(q=-e, m=m_e, n=1.e24, dens_func=dens,
                            p_nz=2, p_nr=2, p_nt=4, uz_m=0.05,
                            p_zmin=0., p_zmax=Lz, p_rmax=12.e-6,
                            sort_K=256 if fused else 0)
        sim.step(10, show_progress=False)
        return np.asarray(sim.state.interp.Ez.re)

    a = run(False)
    b = run(True)
    scale = np.max(np.abs(a))
    assert scale > 0
    assert np.max(np.abs(a - b)) < 1e-9 * scale
