"""Pallas TPU kernel for the sorted (resident-layout) field gather.

gather_fields_sorted contracts a per-particle 4-corner bilinear weight
matrix S (Nz, K, J) against the z-rolled extended field matrix
F_ext (Nz, J, C) -- in plain XLA the one-hot S must be materialized in
HBM (~0.4 GB at bench size) and the mode-sum einsum adds another
(Nz, K, C) round trip: measured 4.47 ms at bench size, HBM-bound.

Design (v2 -- the v1 per-corner contraction was MXU-bound at ~3 ms:
four one-hot fetches x 3 bf16 terms against a (C=24)-wide field block
wastes 5.3x of every 128-lane MXU tile).  All four bilinear corners
are BAKED INTO THE FIELD CHANNELS on the XLA side:

    F4[b, o*Nrx + r, corner*C + c] =
        field channel c at (z row b + o + dz_corner, radial row
        r + dr_corner), dr clamped at the top edge

so C4 = 4*C = 96 fills one 128-lane tile and each particle needs ONE
one-hot fetch: j = (o_lo + D)*Nrx + l_r.  With the resident exact
column sort, delta = iz_lower - col is always in {-1, 0} (the gather
runs at the sort positions), so J2 = 2*Nrx ~ 102 -> one 128-wide
contraction tile.  The fetch runs as an exact-bf16 one-hot against
the 3-term bf16 split of F4 with f32 MXU accumulation (an f32-exact
fetch, the same split trick as pallas_fused.py): 3 MXU passes per row
of (128 x 128 x K) instead of v1's 12 passes of (128 x 256 x K).
Corner weights, the exp(-i m theta) mode sum and the cylindrical
rotation run on the VPU in VMEM; HBM traffic is the geometry rows
(7 x (Nz, K)), F4 (~50 MB), and the (Nz, 6, K) output.

Corner grouping differs from the XLA einsum at f32 rounding level
(weights are applied per corner instead of summed into one S);
results agree to a few f32 ULPs.

MEASURED: see the note appended near gather_sorted_pallas after the
r5 on-chip bench run (tools/gather_bench.py isolates the gather;
bench.py measures the full step).

Reference behavior being replaced: per-particle serialized gather on
CUDA (/root/reference/fbpic/particles/gathering/cuda_methods.py:26-209);
the corner-baked one-hot MXU formulation is original TPU-first design.
"""
import functools
import os

import jax
import jax.numpy as jnp

from .pallas_fused import _VMEM_BUDGET, _VMEM_LIMIT


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
    jax.jit, static_argnames=("Nrx", "Nm", "C", "Jp", "BZ", "interpret"))
def _gather_call(geo, F4, Nrx, Nm, C, Jp, BZ, interpret=False):
    """pallas_call wrapper.  Returns (Nz, 8, K) f32:
    rows [Ex, Ey, Ez, Bx, By, Bz, 0, 0] (padded to a sublane multiple).

    geo (Nz, 8, K): rows [j, Sr_upper, Sz_upper, ok, cos, sin, 0, 0]
        with j = (o_lo + D) * Nrx + l_r precomputed (f32).
    F4 (Nz, C4p, Jp): corner-baked fields, C4p = round_up(4*C, 8);
        corner blocks [z0r0, z0r1, z1r0, z1r1] x channel, channel
        layout comp-major (Er,Et,Ez,Br,Bt,Bz) x mode x re/im.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nz, _, K = geo.shape
    C4p = F4.shape[1]
    f32 = jnp.float32

    def kernel(geo_ref, f4_ref, out_ref):
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (Jp, K), 0)
        for b in range(BZ):
            j = geo_ref[b, 0:1, :]
            sr_u = geo_ref[b, 1:2, :]
            sz_u = geo_ref[b, 2:3, :]
            ok = geo_ref[b, 3:4, :]
            cos = geo_ref[b, 4:5, :]
            sin = geo_ref[b, 5:6, :]
            sr_l = 1.0 - sr_u
            sz_l = 1.0 - sz_u

            # ONE exact-bf16 one-hot fetch of all 4 corners x C
            # channels, F4 split into 3 exact-bf16 terms with f32
            # accumulation (f32-exact fetch; see pallas_fused.py)
            S = (iota_j == j.astype(jnp.int32)).astype(jnp.bfloat16)
            Fb = f4_ref[b]                              # (C4p, Jp) f32
            acc = None
            Fr = Fb
            for t in range(3):
                Ft = Fr.astype(jnp.bfloat16)
                if t < 2:
                    Fr = Fr - Ft.astype(f32)
                if interpret:
                    # The interpreter accumulates bf16-input dots in
                    # bf16 (the real MXU accumulates f32): feed it the
                    # bf16-ROUNDED values as f32 at HIGHEST -- exactly
                    # the hardware arithmetic.
                    p = jax.lax.dot_general(
                        Ft.astype(f32), S.astype(f32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    p = jax.lax.dot_general(
                        Ft, S, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)     # (C4p, K)
                acc = p if acc is None else acc + p

            w00 = sz_l * sr_l * ok
            w01 = sz_l * sr_u * ok
            w10 = sz_u * sr_l * ok
            w11 = sz_u * sr_u * ok
            Fm = (acc[0 * C:1 * C] * w00 + acc[1 * C:2 * C] * w01
                  + acc[2 * C:3 * C] * w10 + acc[3 * C:4 * C] * w11)

            # Mode sum: Re(Fm_c * e^{-i m theta}), weight 1 (m=0) / 2.
            # phase recurrence p_{m+1} = p_m * (cos - i sin)
            six = [jnp.zeros_like(cos) for _ in range(6)]
            pr_m, pi_m = jnp.ones_like(cos), jnp.zeros_like(sin)
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
            pl.BlockSpec((BZ, C4p, Jp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BZ, 8, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(geo, F4)


def _gather_vmem_bytes(BZ, K, C4p, Jp):
    """Conservative VMEM footprint of _gather_call: double-buffered
    blocks (scale with BZ) + row-body stack scratch (reused across the
    unrolled rows; same model as pallas_fused._fused_vmem_bytes)."""
    blocks = BZ * K * 4 * (8 + 8) + BZ * C4p * Jp * 4
    row = (Jp * K * 4            # iota_j (int32)
           + Jp * K * 2          # one-hot S (bf16)
           + 2 * C4p * K * 4     # acc + dot partial (f32)
           + C4p * Jp * 6        # bf16 split terms of Fb
           + 30 * K * 4)         # Fm rows, mode sum, out concat
    return 2 * blocks + row


def _pick_bz(Nz, vmem_of_bz=None):
    """Largest BZ dividing Nz whose footprint fits the budget, or
    None when even BZ=1 does not fit (caller falls back to XLA)."""
    for cand in (8, 6, 4, 3, 2, 1):
        if Nz % cand:
            continue
        if vmem_of_bz is None or vmem_of_bz(cand) <= _VMEM_BUDGET:
            return cand
    return None


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
    C4p = _round_up(4 * C, 8)
    BZ = _pick_bz(Nz, lambda bz: _gather_vmem_bytes(bz, K, C4p, Jp))
    if BZ is None:
        return None            # caller falls back to the XLA einsum
    D = (n_off - 1) // 2

    j = (o_lo * float(Nrx) + l_r).astype(f32)
    geo = jnp.stack([j, sr_upper, sz_upper, ok, cos, sin,
                     jnp.zeros_like(ok), jnp.zeros_like(ok)],
                    axis=1).astype(f32)

    # Corner-baked field blocks: r+1 with top clamp (matches the XLA
    # path's u_r = min(l_r + 1, Nr)), z+1 via roll (periodic wrap --
    # identical to the XLA F_ext roll; open-z grids have damped edges)
    Fr1 = jnp.concatenate([Fg[:, 1:], Fg[:, -1:]], axis=1)
    Fz1 = jnp.roll(Fg, -1, axis=0)
    Fz1r1 = jnp.roll(Fr1, -1, axis=0)
    F4c = jnp.concatenate([Fg, Fr1, Fz1, Fz1r1], axis=-1)  # (Nz,Nrx,4C)
    # XLA-path parity at the top of the offset window: o_hi =
    # min(o_lo + 1, n_off - 1), i.e. at o_lo = n_off - 1 (clipped edge
    # stragglers) the z-high corner collapses onto the z-low row --
    # bake that variant into the TOP o block
    F4clip = jnp.concatenate([Fg, Fr1, Fg, Fr1], axis=-1)
    # z-offset copies for o in [-D, D] -> j blocks of Nrx
    F_ext = jnp.concatenate(
        [jnp.roll(F4c if o < D else F4clip, -o, axis=0)
         for o in range(-D, D + 1)], axis=1)
    F_ext = jnp.swapaxes(F_ext, 1, 2).astype(f32)       # (Nz, 4C, J)
    pads = [(0, 0), (0, C4p - 4 * C), (0, Jp - J)]
    F_ext = jnp.pad(F_ext, pads)

    if interpret is None:
        interpret = _interpret_mode()
    out = _gather_call(geo, F_ext, Nrx=Nrx, Nm=Nm, C=C, Jp=Jp, BZ=BZ,
                       interpret=interpret)
    return tuple(out[:, i, :] for i in range(6))
