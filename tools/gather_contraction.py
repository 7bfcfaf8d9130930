"""Parity + microbenchmark for the PRODUCTION contraction gather.

Exercises fbpic_tpu.particles.gather.gather_fields_sorted -- the
resident-layout replacement for the serialized per-index
gather_fields_linear -- on random particles in the column-padded
(Nz, K) layout, asserting parity against the per-index gather and
(on TPU) slope-timing both at production size.

Usage: python tools/gather_contraction.py [cpu|time]
  cpu  -- small shapes, parity only (used as a quick local check)
  time -- TPU timings only (skips the slow-to-compile per-index
          reference parity pass)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from fbpic_tpu.particles.gather import (
        gather_fields_linear, gather_fields_sorted)
    from fbpic_tpu.particles.sorted_deposit import build_column_sort
    from fbpic_tpu.utils.complex_arr import CArr

    on_cpu = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    # 'time' mode: skip the parity reference (the serialized 1.29M-index
    # gather compiles for ~8 min on the axon tunnel) and run timings only
    time_only = len(sys.argv) > 1 and sys.argv[1] == "time"
    if on_cpu:
        jax.config.update("jax_platforms", "cpu")

    Nz, Nr, Nm = 1116, 50, 2
    K = 1152 if not on_cpu else 128
    NP = 964224 if not on_cpu else 40000
    dz, dr, zmin = 0.1e-6, 0.4e-6, 0.0
    rng = np.random.default_rng(0)

    z = zmin + rng.uniform(0, Nz * dz, NP)
    rr = rng.uniform(0, Nr * dr * 0.99, NP)
    th = rng.uniform(0, 2 * np.pi, NP)
    x, y = rr * np.cos(th), rr * np.sin(th)
    w = np.ones(NP)

    class FakeInterp:
        pass

    interp = FakeInterp()
    for name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
        setattr(interp, name, CArr(
            jnp.asarray(rng.standard_normal((Nm, Nz, Nr)),
                        dtype=jnp.float32),
            jnp.asarray(rng.standard_normal((Nm, Nz, Nr)),
                        dtype=jnp.float32)))

    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    zj = jnp.asarray(z, jnp.float32)
    wj = jnp.asarray(w, jnp.float32)

    sort = build_column_sort(zj, wj, zmin, 1 / dz, Nz, K,
                             payload=(xj, yj, zj, wj))
    xp, yp, zp, wp = sort["padded"]
    rmax = Nr * dr * 2

    def run_sorted(precision=None):
        return gather_fields_sorted(
            xp, yp, zp, sort["valid"], interp, rmax, 1 / dz, zmin, Nz,
            1 / dr, 0.0, Nr, precision=precision)

    if not time_only:
        got = np.stack([np.asarray(a).reshape(-1) for a in run_sorted()],
                       axis=1)
        flat_ok = np.asarray(sort["valid"]).reshape(-1)
        ref = gather_fields_linear(
            xp.reshape(-1), yp.reshape(-1), zp.reshape(-1), interp,
            rmax_gather=rmax, invdz=1 / dz, zmin=zmin, Nz=Nz,
            invdr=1 / dr, rmin=0.0, Nr=Nr)
        ref_np = np.stack([np.asarray(a) for a in ref], axis=1)
        scale = np.abs(ref_np[flat_ok]).max()
        err = np.abs(got[flat_ok] - ref_np[flat_ok]).max()
        print(f"parity vs gather_fields_linear: {err/scale:.2e} "
              f"(scale {scale:.2e})")
        assert err < 2e-5 * scale, "contraction gather mismatch"
    if on_cpu:
        print("CPU parity OK (skip timing)")
        return

    # slope timing
    def time_fn(f, *args):
        jf = jax.jit(f)
        jax.block_until_ready(jf(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    t_idx = time_fn(lambda: gather_fields_linear(
        xj, yj, zj, interp, rmax_gather=rmax, invdz=1 / dz,
        zmin=zmin, Nz=Nz, invdr=1 / dr, rmin=0.0, Nr=Nr))
    print(f"per-index gather (964k flat): {t_idx:.2f} ms", flush=True)
    import jax.lax as lax
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        t_con = time_fn(lambda p=getattr(lax.Precision, prec):
                        run_sorted(precision=p))
        print(f"contraction ({prec}): {t_con:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
