"""Prototype + microbenchmark: field gather as a one-hot MXU contraction.

The production gather (particles/gather.py) pays the serialized
per-index TPU gather cost (~6.6 ns/index) on one 4C-channel fetch per
particle.  With particles resident in the column-padded (Nz, K) layout
(they already are, mid-step, for the fused deposit), the gather can
instead be a batched contraction against a per-column field window:

    out[col, k, ch] = sum_j S[col, k, j] * F_ext[col, j, ch]

with j = (z-offset o in {-1,0,1}) x (radial row in {guard, 0..Nr-1}),
S holding the 4 bilinear corner weights per particle (the below-axis
guard sign flips ride on the F side as a signed guard row), and
F_ext[col, (o, r), ch] = F[mod(col+o, Nz), r, ch].

Correctness is asserted against gather_fields_linear on CPU; run on
the TPU to compare timings (slope-timed fori_loop like profile_hot).

Usage: python tools/gather_contraction.py [cpu]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def gather_fields_sorted(xp, yp, zp, valid, F, invdz, zmin, Nz,
                         invdr, rmin, Nr, Nm, precision=None):
    """Contraction gather on padded (Nz, K) positions.

    F: (Nz, Nr, C) stacked interp channels (C = 6 * Nm * 2).
    Returns (Nz, K, 6) per-particle (Ex, Ey, Ez, Bx, By, Bz)... packed
    as the 6 combined components like gather_fields_linear.
    """
    import jax
    import jax.numpy as jnp
    from fbpic_tpu.particles.gather import _cylindrical_projection

    rdt = xp.dtype
    K = xp.shape[1]
    C = F.shape[-1]
    prec = precision or jax.lax.Precision.HIGHEST

    r, cos, sin = _cylindrical_projection(xp, yp)
    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (zp - zmin) - 0.5

    ir_lower = jnp.floor(r_cell).astype(jnp.int32)
    iz_lower = jnp.floor(z_cell).astype(jnp.int32)
    Sr_upper = r_cell - ir_lower.astype(rdt)
    Sz_upper = z_cell - iz_lower.astype(rdt)
    Sr_lower = 1.0 - Sr_upper
    Sz_lower = 1.0 - Sz_upper
    ok = valid.astype(rdt)

    # Radial extended axis: row 0 = signed guard (ir = -1), rows
    # 1..Nr = ir 0..Nr-1.  Lower corner index l = ir_lower+1 in
    # [0, Nr]; upper corner = min(l+1, Nr) (top clip, as gather.py).
    l_r = jnp.clip(ir_lower + 1, 0, Nr)
    u_r = jnp.minimum(l_r + 1, Nr)

    # z offset of the footprint base from the sort column
    col = jnp.arange(Nz, dtype=jnp.int32)[:, None]
    delta = jnp.clip(iz_lower - col, -1, 1)   # drift <= 1 column

    Nrx = Nr + 1
    J = 3 * Nrx

    # S: 4 weighted one-hots on the combined (o, r) axis
    def onehot(o_idx, ridx, wgt):
        j = o_idx * Nrx + ridx
        return wgt[:, :, None] * jax.nn.one_hot(j, J, dtype=rdt)

    o_lo = (delta + 1)          # o in {-1,0,1} -> {0,1,2}
    o_hi = jnp.minimum(o_lo + 1, 2)
    S = (onehot(o_lo, l_r, Sz_lower * Sr_lower * ok)
         + onehot(o_lo, u_r, Sz_lower * Sr_upper * ok)
         + onehot(o_hi, l_r, Sz_upper * Sr_lower * ok)
         + onehot(o_hi, u_r, Sz_upper * Sr_upper * ok))

    # F_ext: z-rolled copies x [signed guard row; field rows]
    guard_sign = []
    for comp in range(6):
        is_z = comp in (2, 5)
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            s = msign if is_z else -msign
            guard_sign += [s, s]
    guard_sign = jnp.asarray(guard_sign, dtype=rdt)
    Fg = jnp.concatenate([guard_sign[None, None, :] * F[:, :1],
                          F], axis=1)                   # (Nz, Nr+1, C)
    F_ext = jnp.concatenate(
        [jnp.roll(Fg, -o, axis=0) for o in (-1, 0, 1)], axis=1)

    Fm = jnp.einsum("bkj,bjc->bkc", S, F_ext, precision=prec,
                    preferred_element_type=rdt)

    # Mode sum with exp(-i m theta), as gather.py
    pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
    pr_list, pi_list = [pr], [pi]
    for _ in range(1, Nm):
        pr, pi = pr * cos + pi * sin, pi * cos - pr * sin
        pr_list.append(pr)
        pi_list.append(pi)
    mode_w = jnp.asarray([1.0] + [2.0] * (Nm - 1), dtype=rdt)
    W = jnp.stack(
        [jnp.stack(pr_list, axis=-1) * mode_w,
         -jnp.stack(pi_list, axis=-1) * mode_w], axis=-1)
    Fm4 = Fm.reshape(Nz, K, 6, Nm, 2)
    out = jnp.einsum("bkcmt,bkmt->bkc", Fm4, W, precision=prec)
    return out, cos, sin


def main():
    import jax
    import jax.numpy as jnp
    from fbpic_tpu.particles.gather import (
        gather_fields_linear, _stack_interp_channels)
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
    F = _stack_interp_channels(interp, Nm)

    if not time_only:
        _run_parity(sort, xp, yp, zp, F, interp, dz, dr, zmin, Nz, Nr,
                    Nm, gather_fields_linear, np, jnp)
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
        xj, yj, zj, interp, rmax_gather=Nr * dr * 2, invdz=1 / dz,
        zmin=zmin, Nz=Nz, invdr=1 / dr, rmin=0.0, Nr=Nr))
    print(f"per-index gather (964k flat): {t_idx:.2f} ms", flush=True)
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        import jax.lax as lax
        t_con = time_fn(lambda p=getattr(lax.Precision, prec):
                        gather_fields_sorted(
                            xp, yp, zp, sort["valid"], F, 1 / dz, zmin,
                            Nz, 1 / dr, 0.0, Nr, Nm, precision=p))
        print(f"contraction ({prec}): {t_con:.2f} ms", flush=True)


def _run_parity(sort, xp, yp, zp, F, interp, dz, dr, zmin, Nz, Nr, Nm,
                gather_fields_linear, np, jnp):
    out, cos_p, sin_p = gather_fields_sorted(
        xp, yp, zp, sort["valid"], F, 1 / dz, zmin, Nz, 1 / dr, 0.0,
        Nr, Nm)

    # Reference: per-index gather on the same padded positions
    flat_ok = np.asarray(sort["valid"]).reshape(-1)
    ref = gather_fields_linear(
        xp.reshape(-1), yp.reshape(-1), zp.reshape(-1), interp,
        rmax_gather=Nr * dr * 2, invdz=1 / dz, zmin=zmin, Nz=Nz,
        invdr=1 / dr, rmin=0.0, Nr=Nr)
    # combine contraction output into (Ex, Ey, Ez, Bx, By, Bz)
    o2 = np.asarray(out).reshape(-1, 6)
    cosf = np.asarray(cos_p).reshape(-1)
    sinf = np.asarray(sin_p).reshape(-1)
    got = np.stack([cosf * o2[:, 0] - sinf * o2[:, 1],
                    sinf * o2[:, 0] + cosf * o2[:, 1],
                    o2[:, 2],
                    cosf * o2[:, 3] - sinf * o2[:, 4],
                    sinf * o2[:, 3] + cosf * o2[:, 4],
                    o2[:, 5]], axis=1)
    ref_np = np.stack([np.asarray(a) for a in ref], axis=1)
    scale = np.abs(ref_np[flat_ok]).max()
    err = np.abs(got[flat_ok] - ref_np[flat_ok]).max()
    print(f"parity vs gather_fields_linear: {err/scale:.2e} "
          f"(scale {scale:.2e})")
    assert err < 2e-5 * scale, "contraction gather mismatch"


if __name__ == "__main__":
    main()
