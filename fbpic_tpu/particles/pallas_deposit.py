"""Pallas TPU kernel for the column-sorted dense deposition.

The sorted-dense deposition (sorted_deposit.py) contracts per-particle
channel values against a one-hot radial indicator:

    out[col, ir, w] = sum_k S[col, k, ir] * V[col, k, w]

Done in plain XLA this requires materializing V (Nz, K, n_off*2*C) --
~600 MB of HBM traffic per deposit -- and runs as badly-tiled small
matmuls (~2 TF/s measured in round 1).  This kernel builds V and S
in VMEM per column block and feeds the MXU directly, so the only HBM
traffic is the padded particle data in (~100 MB) and the per-column
grid blocks out (~40 MB).

Kernel inputs (channel-major, K along lanes):
  geo  (Nz, G, K):  rows [sr0_m0, sr0_mh, below, ir_buf, zw_0..zw_n-1]
  chan (Nz, Cp, K): base channel values (mode phases already applied)
  cmeta (8, Cp):    rows [is_mode0, flip] per base channel
Output:
  out (Nz, NRP, W): per-column deposited grid, W = n_off*2*Cp wide
                    (radial-corner/z-offset blocks), NRP = padded Nrb.

The caller reassembles z offsets/radial corners with shifted adds and
folds guard cells exactly like sorted_deposit._dense_deposit.

Reference behavior being replaced: cell-sorted register accumulation on
CUDA (/root/reference/fbpic/particles/deposition/cuda_methods.py:28-195).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.complex_arr import CArr
from .deposit import NGUARD, _mode_phases, _fold_guard_cells
from . import sorted_deposit as sd


def _channel_meta(Nm, n_components, comp_flip_parity, dtype):
    """Per-channel meta for the FULL (re, im per mode) layout.

    This Pallas prototype keeps the dense 2-per-mode channel packing
    (incl. the zero mode-0 imag) for lane alignment; the library's
    deposit._channel_meta dropped that channel, so the meta is local."""
    is_mode0, flip = [], []
    for comp in range(n_components):
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            for _part in range(2):
                is_mode0.append(m == 0)
                flip.append(comp_flip_parity[comp] * msign)
    return dict(is_mode0=jnp.asarray(is_mode0, dtype=bool),
                flip=jnp.asarray(flip, dtype=dtype))


def _round_up(x, m):
    return -(-x // m) * m


def pallas_available():
    """True when Pallas/Mosaic TPU kernels can run (TPU backend only:
    the kernels use pltpu.VMEM BlockSpecs, which do not lower on
    CUDA/ROCm)."""
    try:
        from jax.experimental import pallas as pl          # noqa: F401
        from jax.experimental.pallas import tpu as pltpu   # noqa: F401
    except Exception:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("n_off", "Cp", "NRP", "BZ",
                                             "interpret"))
def _onehot_deposit_call(geo, chan, cmeta, n_off, Cp, NRP, BZ,
                        interpret=False):
    """pallas_call wrapper: returns (Nz, NRP, n_off*2*Cp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nz, G, K = geo.shape
    W = n_off * 2 * Cp
    rdt = geo.dtype

    def kernel(geo_ref, chan_ref, cmeta_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (NRP, K), 0).astype(rdt)
        is0 = cmeta_ref[:, 0:1]                  # (Cp, 1)
        flip = cmeta_ref[:, 1:2]                 # (Cp, 1)
        for b in range(BZ):
            g = geo_ref[b]                       # (G, K)
            sr0_m0 = g[0:1, :]                   # (1, K)
            sr0_mh = g[1:2, :]
            below = g[2:3, :]
            irf = g[3:4, :]
            S = (iota == irf).astype(rdt)        # (NRP, K)
            ch = chan_ref[b]                     # (Cp, K)
            sr0c = jnp.where(is0 > 0, sr0_m0, sr0_mh)   # (Cp, K)
            sr1c = 1.0 - sr0c
            sr0c = jnp.where(below > 0, flip * sr0c, sr0c)
            blocks = []
            for o in range(n_off):
                zw = g[4 + o:5 + o, :]           # (1, K)
                blocks.append(ch * zw * sr0c)
                blocks.append(ch * zw * sr1c)
            V = jnp.concatenate(blocks, axis=0)  # (W, K)
            out_ref[b] = jax.lax.dot_general(
                S, V, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(rdt)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Nz, NRP, W), rdt),
        grid=(Nz // BZ,),
        in_specs=[
            pl.BlockSpec((BZ, G, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BZ, Cp, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BZ, NRP, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(geo, chan, cmeta)


def _pallas_dense_deposit(geom, channel_vals, meta, Nz, Nr, zfold,
                          delta_lo, delta_hi, interpret=False):
    """Drop-in replacement for sorted_deposit._dense_deposit."""
    Nzb, Nrb = Nz + 2 * NGUARD, Nr + 2 * NGUARD
    K = channel_vals.shape[1]
    C = channel_vals.shape[2]
    rdt = channel_vals.dtype
    n_off = delta_hi + 2 - delta_lo
    Cp = max(8, _round_up(C, 8))
    NRP = _round_up(Nrb, 64)
    G = _round_up(4 + n_off, 8)
    # Pick BZ dividing Nz (grid must tile exactly)
    BZ = 1
    for cand in (8, 6, 4, 3, 2):
        if Nz % cand == 0:
            BZ = cand
            break

    # geo rows: [sr0_m0, sr0_mh, below, ir_buf, zw_0..]
    rows = [geom["sr0_m0"], geom["sr0_mh"],
            geom["below_axis"].astype(rdt),
            geom["ir_buf"].astype(rdt)] + list(geom["zw"])
    rows += [jnp.zeros_like(rows[0])] * (G - len(rows))
    geo = jnp.stack(rows, axis=1)                        # (Nz, G, K)

    chan = jnp.swapaxes(channel_vals, 1, 2)              # (Nz, C, K)
    if Cp > C:
        chan = jnp.concatenate(
            [chan, jnp.zeros((Nz, Cp - C, K), rdt)], axis=1)

    cmeta = jnp.zeros((Cp, 8), rdt)
    cmeta = cmeta.at[:C, 0].set(meta["is_mode0"].astype(rdt))
    cmeta = cmeta.at[:C, 1].set(meta["flip"].astype(rdt))

    out = _onehot_deposit_call(geo, chan, cmeta, n_off, Cp, NRP, BZ,
                               interpret=interpret)
    out = out.reshape(Nz, NRP, n_off, 2, Cp)[:, :Nrb, :, :, :C]

    # Reassemble exactly like sorted_deposit._dense_deposit
    buf = jnp.zeros((Nzb, Nrb, C), dtype=rdt)
    for i, o in enumerate(range(delta_lo, delta_hi + 2)):
        lo = o + NGUARD
        plane = out[:, :, i, 0, :]
        plane = plane.at[:, 1:, :].add(out[:, :-1, i, 1, :])
        if lo < 0:
            buf = buf.at[:lo + Nz].add(plane[-lo:])
        elif lo + Nz <= Nzb:
            buf = buf.at[lo:lo + Nz].add(plane)
        else:
            buf = buf.at[lo:].add(plane[:Nzb - lo])
    return _fold_guard_cells(buf, Nz, Nr, zfold)


def deposit_rho_J_pallas(sort, x, y, z, w, q, ux, uy, uz, inv_gamma,
                         dt_half, Nm, invdz, zmin, Nz, invdr, rmin, Nr,
                         ruyten_linear, zfold="periodic", interpret=False):
    """Fused J (at current positions) + rho (at positions + a half
    push) deposition from ONE padded gather.

    Returns (Jr, Jt, Jz, rho) as raw CArr (Nm, Nz, Nr) (not divided by
    cell volume).  dt_half: the half-push time step applied to obtain
    the rho positions (c^2 * dt/2 * u * inv_gamma displacement).
    """
    from ..constants import c
    x, y, z, w, ux, uy, uz, inv_gamma = sd._padded_arrays(
        sort, [x, y, z, w, ux, uy, uz, inv_gamma])

    # --- J at the current (n+1/2) positions
    geom_J = sd._padded_geometry(sort, x, y, z, invdz, zmin, Nz, invdr,
                                 rmin, Nr, ruyten_linear, zfold,
                                 delta_lo=-2, delta_hi=1)
    cos, sin = geom_J["cos"], geom_J["sin"]
    cos_m, sin_m = _mode_phases(cos, sin, Nm)
    wj = q * w
    base = [
        wj * c * inv_gamma * (cos * ux + sin * uy),
        wj * c * inv_gamma * (cos * uy - sin * ux),
        wj * c * inv_gamma * uz,
    ]
    vals = [CArr(jnp.stack([b * cm for cm in cos_m], axis=-1),
                 jnp.stack([b * sm for sm in sin_m], axis=-1))
            for b in base]
    cols = []
    for val in vals:
        for m in range(Nm):
            cols.append(val.re[..., m])
            cols.append(val.im[..., m])
    chan_J = jnp.stack(cols, axis=2)                      # (Nz, K, 12)
    meta_J = _channel_meta(Nm, 3, [-1.0, -1.0, +1.0], x.dtype)
    out_J = _pallas_dense_deposit(geom_J, chan_J, meta_J, Nz, Nr, zfold,
                                  -2, 1, interpret=interpret)
    CJ = 2 * Nm
    Jr = CArr(jnp.moveaxis(out_J[..., 0:CJ:2], -1, 0),
              jnp.moveaxis(out_J[..., 1:CJ:2], -1, 0))
    Jt = CArr(jnp.moveaxis(out_J[..., CJ:2 * CJ:2], -1, 0),
              jnp.moveaxis(out_J[..., CJ + 1:2 * CJ:2], -1, 0))
    Jz = CArr(jnp.moveaxis(out_J[..., 2 * CJ:3 * CJ:2], -1, 0),
              jnp.moveaxis(out_J[..., 2 * CJ + 1:3 * CJ:2], -1, 0))

    # --- rho at the half-pushed (n+1) positions (dense padded push;
    # formula identical to push.push_x so the deposit sees bit-identical
    # positions to the canonical second half-push)
    chdt = c * dt_half
    x2 = x + chdt * inv_gamma * ux
    y2 = y + chdt * inv_gamma * uy
    z2 = z + chdt * inv_gamma * uz
    geom_R = sd._padded_geometry(sort, x2, y2, z2, invdz, zmin, Nz, invdr,
                                 rmin, Nr, ruyten_linear, zfold,
                                 delta_lo=-2, delta_hi=1)
    cos2, sin2 = geom_R["cos"], geom_R["sin"]
    cos_m2, sin_m2 = _mode_phases(cos2, sin2, Nm)
    cols = []
    for m in range(Nm):
        cols.append(wj * cos_m2[m])
        cols.append(wj * sin_m2[m])
    chan_R = jnp.stack(cols, axis=2)                      # (Nz, K, 2Nm)
    meta_R = _channel_meta(Nm, 1, [+1.0], x.dtype)
    out_R = _pallas_dense_deposit(geom_R, chan_R, meta_R, Nz, Nr, zfold,
                                  -2, 1, interpret=interpret)
    rho = CArr(jnp.moveaxis(out_R[..., 0::2], -1, 0),
               jnp.moveaxis(out_R[..., 1::2], -1, 0))
    return Jr, Jt, Jz, rho
