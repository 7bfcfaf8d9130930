"""Standalone cost of the resident-path hot ops at bench shapes.

Per-op profiles on this backend over-attribute spans (see
tools/trace_idle.py), so this tool measures GROUND-TRUTH wall time of
each resident-step component in isolation (jit, steady state):

  banded   : banded_column_resort (the per-step re-sort)
  gather   : gather_fields_sorted (E,B one-hot MXU contraction)
  deposit  : deposit_rho_J_sorted with_drho=True sort_at_start=True
             (the production fused J + drho contraction)
  dep_rho  : same but with_rho=True with_drho=False (plain J+rho)

Usage: python tools/deposit_bench.py [Nz K]   (defaults 1116 1152)

MEASURED (TPU v5e via axon, Nz=1116 K=1152 Nr=50 Nm=2, f32, comp on,
2026-08-19, ~60% live occupancy):
  banded   :   1.64 ms
  gather   :   4.47 ms
  deposit  :   8.79 ms
  dep_rho  :   6.39 ms
  sum (banded+gather+deposit) = 14.9 of the 22.4 ms step -- the
  remaining ~7.5 ms is PSATD + transforms + push + window/injection.
The deposit's V blocks (3 bf16 terms x (Nz, K, 132)) and the gather's
(Nz, K, C) padded one-hot products dominate HBM traffic; both are
fusion-bound, not MXU-bound.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fbpic_tpu.particles.sorted_deposit import (
    build_column_sort, banded_column_resort, deposit_rho_J_sorted)
from fbpic_tpu.particles.gather import gather_fields_sorted
from fbpic_tpu.utils.complex_arr import CArr


def tm(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    Nz = int(sys.argv[1]) if len(sys.argv) > 1 else 1116
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 1152
    Nr, Nm = 50, 2
    dz, dr = 5e-8, 4e-7
    zmin = 0.0
    rng = np.random.default_rng(0)
    Np = Nz * K
    rdt = jnp.float32

    # ~60% live, column-sorted starting layout (the resident state)
    live_frac = 0.6
    z = rng.uniform(zmin, zmin + Nz * dz, Np)
    r = rng.uniform(0, Nr * dr * 0.9, Np)
    th = rng.uniform(0, 2 * np.pi, Np)
    w = (rng.random(Np) < live_frac).astype(np.float64) * 1e5
    arrs = dict(
        x=r * np.cos(th), y=r * np.sin(th), z=z, w=w,
        ux=rng.standard_normal(Np) * 0.1,
        uy=rng.standard_normal(Np) * 0.1,
        uz=rng.standard_normal(Np) * 0.1,
    )
    arrs["inv_gamma"] = 1.0 / np.sqrt(
        1 + arrs["ux"] ** 2 + arrs["uy"] ** 2 + arrs["uz"] ** 2)
    comp = [np.zeros(Np)] * 3
    payload = tuple(jnp.asarray(a, rdt) for a in (
        arrs["x"], arrs["y"], arrs["z"], arrs["w"], arrs["ux"],
        arrs["uy"], arrs["uz"], arrs["inv_gamma"], *comp))

    sort0 = jax.jit(lambda pl: build_column_sort(
        pl[2], pl[3], zmin, 1.0 / dz, Nz, K, payload=pl))(payload)
    padded = tuple(sort0["padded"])
    valid = sort0["valid"]
    print(f"shapes: Nz={Nz} K={K} live={float(jnp.sum(valid)):.0f}")

    # --- banded re-sort
    f_band = jax.jit(lambda p: banded_column_resort(
        p, zmin, 1.0 / dz, Nz, K, band=1, zfold="clamp"))
    print(f"banded   : {tm(f_band, padded):8.3f} ms")

    # --- gather (E,B fields)
    interp = []
    for name in range(10):
        re = jnp.asarray(rng.standard_normal((Nm, Nz, Nr)), rdt)
        im = jnp.asarray(rng.standard_normal((Nm, Nz, Nr)), rdt)
        interp.append(CArr(re, im))

    class _Interp:
        Er, Et, Ez, Br, Bt, Bz, Jr, Jt, Jz, rho = interp
    x_p, y_p, z_p = padded[0], padded[1], padded[2]
    cmp_p = (padded[8], padded[9], padded[10])

    f_gath = jax.jit(lambda xx, yy, zz, vv: gather_fields_sorted(
        xx, yy, zz, vv, _Interp, Nr * dr, 1.0 / dz, zmin, Nz,
        1.0 / dr, 0.0, Nr, comp=cmp_p, zfold="clamp"))
    print(f"gather   : {tm(f_gath, x_p, y_p, z_p, valid):8.3f} ms")

    # --- fused deposit (production: with_drho, sort_at_start)
    ruyten = (jnp.asarray(rng.standard_normal(Nr + 1), rdt) * 0.1,
              jnp.asarray(rng.standard_normal(Nr + 1), rdt) * 0.1)
    dt_half = dz / 6e8

    def dep(p, vv, with_drho):
        sort = dict(valid=vv, n_over=jnp.int32(0), padded=list(p[:11]))
        return deposit_rho_J_sorted(
            sort, p[0], p[1], p[2], p[3], -1.6e-19, p[4], p[5], p[6],
            p[7], dt_half, Nm, 1.0 / dz, zmin, Nz, 1.0 / dr, 0.0, Nr,
            ruyten, zfold="clamp", comp=(p[8], p[9], p[10]),
            with_drho=with_drho, with_rho=not with_drho,
            sort_at_start=True)

    f_dep = jax.jit(lambda p, vv: dep(p, vv, True))
    print(f"deposit  : {tm(f_dep, padded, valid):8.3f} ms")
    f_dep2 = jax.jit(lambda p, vv: dep(p, vv, False))
    print(f"dep_rho  : {tm(f_dep2, padded, valid):8.3f} ms")


if __name__ == "__main__":
    main()
