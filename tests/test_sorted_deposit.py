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


if __name__ == "__main__":
    test_sorted_matches_scatter()
