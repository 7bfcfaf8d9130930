"""Pallas TPU kernel for the sorted (resident-layout) field gather.

gather_fields_sorted contracts a per-particle 4-corner bilinear weight
matrix S (Nz, K, J) against the z-rolled extended field matrix
F_ext (Nz, J, C), J = n_off * (Nr + 1).  In plain XLA the one-hot S
must be materialized in HBM (~0.4 GB at bench size) and the mode-sum
einsum adds another (Nz, K, C) round trip -- measured 4.47 ms at
bench size, purely HBM-bound (tools/deposit_bench.py r4; the same
pattern the Pallas deposit kernel removed).

This kernel builds each corner's one-hot selector in VMEM and fetches
the field columns on the MXU: per corner, an EXACT-bf16 one-hot
selector contracts against the 3-term bf16 split of F_ext with f32
accumulation (an f32-exact fetch of the 4 corner field values, the
same split trick as pallas_fused.py), then the f32 corner weights,
the exp(-i m theta) mode sum, and the cylindrical -> Cartesian
rotation all run on the VPU in VMEM.  HBM traffic: the per-particle
geometry rows (7 x (Nz, K)), F_ext (small), and the (Nz, 6, K)
output -- no (Nz, K, J) or (Nz, K, C) intermediate ever exists.

Corner grouping differs from the XLA einsum at f32 rounding level
when two corners clip onto the same (o, r) column (the XLA path sums
their weights before multiplying); results agree to ~1e-6 relative.

MEASURED: see the note appended near gather_sorted_pallas after the
r5 on-chip bench run (tools/gather_bench.py isolates the gather;
bench.py measures the full step).

Reference behavior being replaced: per-particle serialized gather on
CUDA (/root/reference/fbpic/particles/gathering/cuda_methods.py:26-209);
the one-hot MXU formulation is original TPU-first design.
"""
import functools
import os

import jax
import jax.numpy as jnp


def _round_up(x, m):
    return -(-x // m) * m


def pallas_gather_enabled(dtype):
    """Production gate: f32 on TPU, unless opted out.

    FBPIC_TPU_PALLAS_GATHER: "auto" (default; on for f32 on TPU),
    "0" (off), "1" (force on), "interpret" (force on in Pallas
    interpreter mode -- CPU parity tests)."""
    mode = os.environ.get("FBPIC_TPU_PALLAS_GATHER", "auto")
    if mode == "0":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if mode in ("1", "interpret"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _interpret_mode():
    return os.environ.get("FBPIC_TPU_PALLAS_GATHER", "auto") == "interpret"


@functools.partial(
    jax.jit, static_argnames=("n_off", "Nrx", "Nm", "C", "Jp", "BZ",
                              "guard_sign", "interpret"))
def _gather_call(geo, F_ext, n_off, Nrx, Nm, C, Jp, BZ,
                 guard_sign, interpret=False):
    """pallas_call wrapper.  Returns (Nz, 8, K) f32:
    rows [Ex, Ey, Ez, Bx, By, Bz, 0, 0] (padded to a sublane multiple).

    geo (Nz, 8, K): rows [o_lo, l_r, Sr_upper, Sz_upper, ok, cos,
                          sin, 0]
    F_ext (Nz, C, Jp): F_ext[b, c, o * Nrx + r] = field channel c of
        radial row r (0 = signed axis guard) at z column b + o - D,
        zero-padded to Jp lanes.  Channel layout comp-major
        (Er,Et,Ez,Br,Bt,Bz) x mode x re/im (C = 12 * Nm).
    guard_sign: unused here (already folded into F_ext); kept in the
        signature so the cache key changes if the layout ever does.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nz, _, K = geo.shape
    f32 = jnp.float32

    def kernel(geo_ref, fe_ref, out_ref):
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (Jp, K), 0)
        for b in range(BZ):
            o_lo = geo_ref[b, 0:1, :]
            l_r = geo_ref[b, 1:2, :]
            sr_u = geo_ref[b, 2:3, :]
            sz_u = geo_ref[b, 3:4, :]
            ok = geo_ref[b, 4:5, :]
            cos = geo_ref[b, 5:6, :]
            sin = geo_ref[b, 6:7, :]
            sr_l = 1.0 - sr_u
            sz_l = 1.0 - sz_u
            o_hi = jnp.minimum(o_lo + 1.0, float(n_off - 1))
            u_r = jnp.minimum(l_r + 1.0, float(Nrx - 1))

            # 3-term bf16 split of the field block: each term is exact
            # in bf16, the one-hot selector is exact in bf16, and the
            # MXU accumulates f32 -- an f32-exact fetch (pallas_fused)
            Fb = fe_ref[b]                              # (C, Jp) f32
            terms = []
            Fr = Fb
            for t in range(3):
                Ft = Fr.astype(jnp.bfloat16)
                if t < 2:
                    Fr = Fr - Ft.astype(f32)
                terms.append(Ft)

            def fetch(o_idx, r_idx):
                j = (o_idx * float(Nrx) + r_idx).astype(jnp.int32)
                S = (iota_j == j).astype(jnp.bfloat16)  # (Jp, K)
                acc = None
                for Ft in terms:
                    if interpret:
                        # The interpreter accumulates bf16-input dots
                        # in bf16 (the real MXU accumulates f32): feed
                        # it the bf16-ROUNDED values as f32 at HIGHEST
                        # -- exactly the hardware arithmetic.
                        p = jax.lax.dot_general(
                            Ft.astype(f32), S.astype(f32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
                    else:
                        p = jax.lax.dot_general(
                            Ft, S, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)  # (C, K)
                    acc = p if acc is None else acc + p
                return acc

            Fm = (fetch(o_lo, l_r) * (sz_l * sr_l * ok)
                  + fetch(o_lo, u_r) * (sz_l * sr_u * ok)
                  + fetch(o_hi, l_r) * (sz_u * sr_l * ok)
                  + fetch(o_hi, u_r) * (sz_u * sr_u * ok))  # (C, K)

            # Mode sum: Re(Fm_c * e^{-i m theta}), weight 1 (m=0) / 2.
            # phase recurrence p_{m+1} = p_m * (cos - i sin)
            pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
            six = []
            for comp_i in range(6):
                six.append(jnp.zeros_like(cos))
            pr_m, pi_m = pr, pi
            for m in range(Nm):
                w_m = 1.0 if m == 0 else 2.0
                for comp_i in range(6):
                    base = (comp_i * Nm + m) * 2
                    six[comp_i] = six[comp_i] + w_m * (
                        Fm[base:base + 1, :] * pr_m
                        - Fm[base + 1:base + 2, :] * pi_m)
                pr_m, pi_m = (pr_m * cos + pi_m * sin,
                              pi_m * cos - pr_m * sin)

            Fr_E, Ft_E, Fz_E, Fr_B, Ft_B, Fz_B = six
            out = jnp.concatenate(
                [cos * Fr_E - sin * Ft_E,
                 sin * Fr_E + cos * Ft_E,
                 Fz_E,
                 cos * Fr_B - sin * Ft_B,
                 sin * Fr_B + cos * Ft_B,
                 Fz_B,
                 jnp.zeros_like(cos), jnp.zeros_like(cos)], axis=0)
            out_ref[b] = out

    grid = (Nz // BZ,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Nz, 8, K), f32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BZ, 8, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BZ, C, Jp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BZ, 8, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(geo, F_ext)


def _pick_bz(Nz):
    for cand in (8, 6, 4, 3, 2):
        if Nz % cand == 0:
            return cand
    return 1


def gather_sorted_pallas(o_lo, l_r, sr_upper, sz_upper, ok, cos, sin,
                         Fg, n_off, Nm, Nz, Nr, interpret=None):
    """Drop-in core for gather_fields_sorted.

    o_lo (Nz, K) f32: clipped z-offset index in [0, n_off).
    l_r (Nz, K) f32: lower radial row in the extended axis [0, Nr].
    Fg (Nz, Nr+1, C): fields with the signed axis-guard row prepended.
    Returns (Ex, Ey, Ez, Bx, By, Bz) as (Nz, K) f32 arrays.
    """
    f32 = jnp.float32
    Nrx = Nr + 1
    C = Fg.shape[-1]
    J = n_off * Nrx
    Jp = _round_up(J, 128)
    K = o_lo.shape[1]
    BZ = _pick_bz(Nz)
    D = (n_off - 1) // 2

    geo = jnp.stack([o_lo, l_r, sr_upper, sz_upper, ok, cos, sin,
                     jnp.zeros_like(ok)], axis=1).astype(f32)
    # (Nz, J, C): rolled copies along z, then -> (Nz, C, Jp)
    F_ext = jnp.concatenate(
        [jnp.roll(Fg, -o, axis=0) for o in range(-D, D + 1)], axis=1)
    F_ext = jnp.swapaxes(F_ext, 1, 2).astype(f32)       # (Nz, C, J)
    if Jp > J:
        F_ext = jnp.concatenate(
            [F_ext, jnp.zeros((Nz, C, Jp - J), f32)], axis=2)

    if interpret is None:
        interpret = _interpret_mode()
    out = _gather_call(geo, F_ext, n_off=n_off, Nrx=Nrx, Nm=Nm, C=C,
                       Jp=Jp, BZ=BZ, guard_sign=None,
                       interpret=interpret)
    return tuple(out[:, i, :] for i in range(6))
