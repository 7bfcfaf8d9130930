"""Charge / current deposition: particles -> grid.

TPU-native scatter design: per-particle cell indices and shape weights
are computed vectorized, and ALL payload channels (azimuthal modes x
re/im x J components) are deposited in a single scatter-add with a
trailing channel axis -- the scatter then moves a whole channel vector
per index, which is the efficient regime for XLA's TPU scatter.  Guard
cells are folded back (periodic in z, reflected across the axis in r)
with cheap array ops.

This replaces the reference's per-thread buffer copies (CPU) and
cell-sorted atomics (GPU)
(/root/reference/fbpic/particles/deposition/threading_methods.py:28-455,
fields/numba_methods.py:410-460).

Shape factors include the Ruyten correction and the below-axis sign flip
(deposition/particle_shapes.py:17-80).
"""
import jax
import jax.numpy as jnp

from ..constants import c
from ..utils.complex_arr import CArr
from .gather import _cylindrical_projection

# Guard cells on each side of the deposition buffer (enough for cubic)
NGUARD = 2


def _mode_phases(cos, sin, Nm):
    """Lists of (cos(m th), sin(m th)) for m = 0..Nm-1."""
    re_m, im_m = jnp.ones_like(cos), jnp.zeros_like(sin)
    res, ims = [re_m], [im_m]
    for _ in range(1, Nm):
        re_m, im_m = re_m * cos - im_m * sin, re_m * sin + im_m * cos
        res.append(re_m)
        ims.append(im_m)
    return res, ims


def _fold_guard_cells(buf, Nz, Nr, zfold="periodic"):
    """Fold a (Nz+4, Nr+4, C) deposition buffer into (Nz, Nr, C).

    z guards: periodic wrap (rows 0,1 -> Nz-2,Nz-1; rows Nz+2,Nz+3 ->
    0,1) or accumulation into the edge cells ('clamp', used with open
    boundaries where the exchange is handled separately).
    r guards: reflection across the axis (cols 0 -> ir=1, 1 -> ir=0) and
    clamping at rmax (cols Nr+2, Nr+3 -> ir=Nr-1).
    Reference: fields/numba_methods.py:410-460.
    """
    g = NGUARD
    core_z = buf[g:Nz + g]
    if zfold == "periodic":
        core_z = core_z.at[Nz - 2].add(buf[0])
        core_z = core_z.at[Nz - 1].add(buf[1])
        core_z = core_z.at[0].add(buf[Nz + 2])
        core_z = core_z.at[1].add(buf[Nz + 3])
    elif zfold == "clamp":
        core_z = core_z.at[0].add(buf[0] + buf[1])
        core_z = core_z.at[Nz - 1].add(buf[Nz + 2] + buf[Nz + 3])
    else:
        raise ValueError(zfold)

    out = core_z[:, g:Nr + g]
    out = out.at[:, 1].add(core_z[:, 0])
    out = out.at[:, 0].add(core_z[:, 1])
    out = out.at[:, Nr - 1].add(core_z[:, Nr + 2] + core_z[:, Nr + 3])
    return out


def _geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr, ruyten,
              comp=None):
    """Linear-shape geometry: corner indices, weights, angles.

    Returns a dict with per-particle quantities; radial lower-corner
    weights are per mode-row (mode 0 vs higher) with the Ruyten
    correction, plus the below-axis flag used for sign flips.
    """
    r, cos, sin = _cylindrical_projection(x, y)
    rdt = x.dtype

    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (z - zmin) - 0.5

    iz_low = jnp.ceil(z_cell).astype(jnp.int32) - 1
    sz1 = z_cell - iz_low.astype(rdt)

    ir_low = jnp.ceil(r_cell).astype(jnp.int32) - 1
    u = r_cell - ir_low.astype(rdt)
    if comp is not None:
        # Fold the Kahan position residuals into the SUB-CELL offsets
        # (O(1) numbers), AFTER the big z_cell - iz_low cancellation:
        # the residual displacement (sub-ULP of both the absolute
        # position and the O(Nz) cell coordinate) is well above the
        # ULP of the sub-cell offset, so the slow (wake-scale) motion
        # survives in the shape weights
        cx, cy, cz = comp
        sz1 = sz1 + invdz * cz
        u = u + invdr * ((x * cx + y * cy) / jnp.maximum(r, 1e-30))
    sz0 = 1.0 - sz1
    bn_idx = jnp.clip(jnp.ceil(r_cell).astype(jnp.int32), 0, Nr)
    base0 = 1.0 - u
    corr = (1.0 - u) * u
    sr0_m0 = base0 + ruyten[0][bn_idx] * corr
    sr0_mh = base0 + ruyten[1][bn_idx] * corr

    below_axis = ir_low < 0

    Nzb, Nrb = Nz + 2 * NGUARD, Nr + 2 * NGUARD
    # Clip stragglers (particles beyond the removal margin) into the
    # guard rows instead of letting negative indices wrap circularly.
    iz_buf = jnp.clip(iz_low + NGUARD, 0, Nz + NGUARD)
    ir_buf = jnp.minimum(ir_low + NGUARD, Nr + NGUARD)
    idx00 = iz_buf * Nrb + ir_buf

    return dict(
        cos=cos, sin=sin, below_axis=below_axis,
        sz0=sz0, sz1=sz1, sr0_m0=sr0_m0, sr0_mh=sr0_mh,
        idx00=idx00, Nzb=Nzb, Nrb=Nrb,
    )


def _deposit_channels(geom, channel_vals, flip_parities, Nm, Nzb, Nrb,
                      Nz, Nr, zfold):
    """Scatter all channels at once with a trailing channel axis.

    channel_vals: (Np, C) where C enumerates (component, mode, re/im).
    flip_parities: (C,) array of +-1 -- the below-axis flip sign of each
    channel ((-1)^m for rho/Jz channels, -(-1)^m for Jr/Jt channels).
    mode_rows: channels belonging to mode 0 use the mode-0 Ruyten row.

    Returns the folded (Nz, Nr, C) real array.
    """
    sz0, sz1 = geom["sz0"], geom["sz1"]
    below = geom["below_axis"]
    idx00 = geom["idx00"]

    # Radial lower-corner weights per channel: mode-0 channels use the
    # mode-0 Ruyten row.  flip applies only to the lower corner (the
    # only one that can sit below the axis).
    mode0_mask = flip_parities["is_mode0"]       # (C,) bool
    flips = flip_parities["flip"]                # (C,) +-1 float
    sr0 = jnp.where(mode0_mask[None, :], geom["sr0_m0"][:, None],
                    geom["sr0_mh"][:, None])     # (Np, C)
    sr1 = 1.0 - sr0
    sr0 = jnp.where(below[:, None], flips[None, :] * sr0, sr0)

    v = channel_vals                              # (Np, C)
    v00 = v * (sz0[:, None] * sr0)
    v01 = v * (sz0[:, None] * sr1)
    v10 = v * (sz1[:, None] * sr0)
    v11 = v * (sz1[:, None] * sr1)

    # Scatter ONCE at the base corner with 4x channels; the TPU scatter
    # cost is per-index (channels ride along nearly free), so folding the
    # 2x2 footprint into channels and applying the corner offsets as
    # shifted adds on the grid is ~4x cheaper than scattering 4 corners.
    vals = jnp.concatenate([v00, v01, v10, v11], axis=1)   # (Np, 4C)
    C = channel_vals.shape[1]
    buf = jnp.zeros((Nzb * Nrb, 4 * C), dtype=v.dtype).at[idx00].add(vals)
    buf = buf.reshape(Nzb, Nrb, 4, C)

    out = buf[:, :, 0, :]
    out = out.at[:, 1:, :].add(buf[:, :-1, 1, :])          # (iz, ir+1)
    out = out.at[1:, :, :].add(buf[:-1, :, 2, :])          # (iz+1, ir)
    out = out.at[1:, 1:, :].add(buf[:-1, :-1, 3, :])       # (iz+1, ir+1)

    return _fold_guard_cells(out, Nz, Nr, zfold)


def _channel_meta(Nm, n_components, comp_flip_parity, dtype):
    """Per-channel metadata arrays for (component, mode, re/im) channels.

    Channel layout: comp-major, then mode, then re/im -- EXCEPT that the
    mode-0 imaginary part (identically zero: sin(0*theta) = 0) is not
    stored, so each component spans 2*Nm - 1 channels.  Dropping the
    dead channel cuts the deposition channel matrices (the scatter
    value tensor and the sorted-dense V) by 25% at Nm=2.
    """
    is_mode0 = []
    flip = []
    for comp in range(n_components):
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            for _part in range(1 if m == 0 else 2):
                is_mode0.append(m == 0)
                flip.append(comp_flip_parity[comp] * msign)
    return dict(
        is_mode0=jnp.asarray(is_mode0, dtype=bool),
        flip=jnp.asarray(flip, dtype=dtype),
    )


def _pack_channels(values, Nm):
    """Pack a list of per-component CArr (Nm, Np) into (Np, C) channels
    (C = n_comp * (2*Nm - 1); the zero mode-0 imag is not stored)."""
    cols = []
    for val in values:
        for m in range(Nm):
            cols.append(val.re[m])
            if m > 0:
                cols.append(val.im[m])
    return jnp.stack(cols, axis=1)


def _unpack_channels(arr, n_components, Nm):
    """Unpack (Nz, Nr, C) channels back into a list of CArr (Nm, Nz, Nr)."""
    out = []
    i = 0
    for _comp in range(n_components):
        res, ims = [], []
        for _m in range(Nm):
            res.append(arr[:, :, i])
            if _m == 0:
                ims.append(jnp.zeros_like(arr[:, :, i]))
                i += 1
            else:
                ims.append(arr[:, :, i + 1])
                i += 2
        out.append(CArr(jnp.stack(res), jnp.stack(ims)))
    return out


def deposit_rho_linear(x, y, z, w, q, Nm, invdz, zmin, Nz, invdr, rmin, Nr,
                       ruyten_linear, zfold="periodic", comp=None):
    """Deposit charge density (not yet divided by cell volume).

    Returns CArr (Nm, Nz, Nr).
    """
    geom = _geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                     ruyten_linear, comp=comp)
    cos_m, sin_m = _mode_phases(geom["cos"], geom["sin"], Nm)
    wj = q * w
    rho_modes = CArr(jnp.stack([wj * cm for cm in cos_m]),
                     jnp.stack([wj * sm for sm in sin_m]))
    channels = _pack_channels([rho_modes], Nm)
    meta = _channel_meta(Nm, 1, [+1.0], x.dtype)
    out = _deposit_channels(geom, channels, meta, Nm, geom["Nzb"],
                            geom["Nrb"], Nz, Nr, zfold)
    return _unpack_channels(out, 1, Nm)[0]


def deposit_J_linear(x, y, z, w, q, ux, uy, uz, inv_gamma, Nm,
                     invdz, zmin, Nz, invdr, rmin, Nr, ruyten_linear,
                     zfold="periodic", comp=None):
    """Deposit current density; returns (Jr, Jt, Jz) CArr (Nm, Nz, Nr)."""
    geom = _geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                     ruyten_linear, comp=comp)
    cos, sin = geom["cos"], geom["sin"]
    cos_m, sin_m = _mode_phases(cos, sin, Nm)
    wj = q * w
    jr0 = wj * c * inv_gamma * (cos * ux + sin * uy)
    jt0 = wj * c * inv_gamma * (cos * uy - sin * ux)
    jz0 = wj * c * inv_gamma * uz

    vals = [
        CArr(jnp.stack([j0 * cm for cm in cos_m]),
             jnp.stack([j0 * sm for sm in sin_m]))
        for j0 in (jr0, jt0, jz0)
    ]
    channels = _pack_channels(vals, Nm)
    # Jr/Jt flip with -(-1)^m below the axis; Jz with (-1)^m
    meta = _channel_meta(Nm, 3, [-1.0, -1.0, +1.0], x.dtype)
    out = _deposit_channels(geom, channels, meta, Nm, geom["Nzb"],
                            geom["Nrb"], Nz, Nr, zfold)
    Jr, Jt, Jz = _unpack_channels(out, 3, Nm)
    return Jr, Jt, Jz


# ---------------------------------------------------------------------
# Cubic (third-order) shapes
# ---------------------------------------------------------------------

def _cubic_axis_weights(cell_pos, extra=None):
    """Cubic B-spline weights s0..s3 with i_low = ceil(pos) - 2.

    u = pos - i_low - 1 in [0, 1); `extra` is a sub-ULP-of-cell_pos
    residual added AFTER the cancellation (Kahan position
    compensation).  Reference: deposition/particle_shapes.py:42-56.
    """
    i_low = jnp.ceil(cell_pos).astype(jnp.int32) - 2
    u = cell_pos - i_low.astype(cell_pos.dtype) - 1.0
    if extra is not None:
        u = u + extra
    v = 1.0 - u
    s0 = (1.0 / 6.0) * v**3
    s1 = (1.0 / 6.0) * (3.0 * u**3 - 6.0 * u**2 + 4.0)
    s2 = (1.0 / 6.0) * (3.0 * v**3 - 6.0 * v**2 + 4.0)
    s3 = (1.0 / 6.0) * u**3
    return i_low, u, (s0, s1, s2, s3)


def _geometry_cubic(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                    ruyten_cubic, comp=None):
    """Cubic-shape geometry: 4x4 footprint weights and base index."""
    r, cos, sin = _cylindrical_projection(x, y)
    rdt = x.dtype

    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (z - zmin) - 0.5
    ez = er = None
    if comp is not None:
        # Kahan position residuals, folded into the sub-cell offsets
        # inside _cubic_axis_weights (after the big cancellation)
        cx, cy, cz = comp
        ez = invdz * cz
        er = invdr * ((x * cx + y * cy) / jnp.maximum(r, 1e-30))

    iz_low, _, sz = _cubic_axis_weights(z_cell, extra=ez)
    ir_low, u, sr_plain = _cubic_axis_weights(r_cell, extra=er)

    # Ruyten correction on the two central points (+bn on s1, -bn on s2)
    bn_idx = jnp.clip(jnp.ceil(r_cell).astype(jnp.int32), 0, Nr)
    corr = (1.0 - u) * u
    bn0 = ruyten_cubic[0][bn_idx] * corr
    bnh = ruyten_cubic[1][bn_idx] * corr
    # sr rows per mode-row (mode0 / higher): list of 4 per row
    sr_m0 = (sr_plain[0], sr_plain[1] + bn0, sr_plain[2] - bn0, sr_plain[3])
    sr_mh = (sr_plain[0], sr_plain[1] + bnh, sr_plain[2] - bnh, sr_plain[3])

    Nzb, Nrb = Nz + 2 * NGUARD, Nr + 2 * NGUARD
    iz_buf = jnp.clip(iz_low + NGUARD, 0, Nz + NGUARD - 2)
    ir_buf = jnp.minimum(ir_low + NGUARD, Nr)   # footprint cols <= Nr+3
    idx00 = iz_buf * Nrb + ir_buf

    return dict(
        cos=cos, sin=sin, ir_low=ir_low,
        sz=sz, sr_m0=sr_m0, sr_mh=sr_mh,
        idx00=idx00, Nzb=Nzb, Nrb=Nrb,
    )


def _deposit_channels_cubic(geom, channel_vals, meta, Nm, Nzb, Nrb,
                            Nz, Nr, zfold):
    """Cubic 4x4 scatter: 16 corner blocks as channels at one base index."""
    sz = geom["sz"]
    ir_low = geom["ir_low"]
    idx00 = geom["idx00"]
    mode0_mask = meta["is_mode0"]
    flips = meta["flip"]

    blocks = []
    for jr in range(4):
        sr = jnp.where(mode0_mask[None, :], geom["sr_m0"][jr][:, None],
                       geom["sr_mh"][jr][:, None])    # (Np, C)
        # Below-axis sign flip when the absolute radial index is negative
        below = (ir_low + jr) < 0
        sr = jnp.where(below[:, None], flips[None, :] * sr, sr)
        for jz in range(4):
            blocks.append(channel_vals * (sz[jz][:, None] * sr))
    vals = jnp.concatenate(blocks, axis=1)            # (Np, 16*C)

    C = channel_vals.shape[1]
    buf = jnp.zeros((Nzb * Nrb, 16 * C),
                    dtype=channel_vals.dtype).at[idx00].add(vals)
    buf = buf.reshape(Nzb, Nrb, 4, 4, C)              # (z, r, jr, jz, C)

    out = jnp.zeros((Nzb, Nrb, C), dtype=channel_vals.dtype)
    for jr in range(4):
        for jz in range(4):
            blk = buf[:, :, jr, jz, :]
            zs = slice(jz, None) if jz else slice(None)
            zsrc = slice(None, Nzb - jz) if jz else slice(None)
            rs = slice(jr, None) if jr else slice(None)
            rsrc = slice(None, Nrb - jr) if jr else slice(None)
            out = out.at[zs, rs, :].add(blk[zsrc, rsrc, :])
    return _fold_guard_cells(out, Nz, Nr, zfold)


def deposit_rho_cubic(x, y, z, w, q, Nm, invdz, zmin, Nz, invdr, rmin, Nr,
                      ruyten_cubic, zfold="periodic", comp=None):
    """Deposit charge density with cubic shapes; returns CArr (Nm,Nz,Nr)."""
    geom = _geometry_cubic(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                           ruyten_cubic, comp=comp)
    cos_m, sin_m = _mode_phases(geom["cos"], geom["sin"], Nm)
    wj = q * w
    vals = [CArr(jnp.stack([wj * cm for cm in cos_m]),
                 jnp.stack([wj * sm for sm in sin_m]))]
    channels = _pack_channels(vals, Nm)
    meta = _channel_meta(Nm, 1, [+1.0], x.dtype)
    out = _deposit_channels_cubic(geom, channels, meta, Nm, geom["Nzb"],
                                  geom["Nrb"], Nz, Nr, zfold)
    return _unpack_channels(out, 1, Nm)[0]


def deposit_J_cubic(x, y, z, w, q, ux, uy, uz, inv_gamma, Nm,
                    invdz, zmin, Nz, invdr, rmin, Nr, ruyten_cubic,
                    zfold="periodic", comp=None):
    """Deposit current density with cubic shapes."""
    geom = _geometry_cubic(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                           ruyten_cubic, comp=comp)
    cos, sin = geom["cos"], geom["sin"]
    cos_m, sin_m = _mode_phases(cos, sin, Nm)
    wj = q * w
    base = [
        wj * c * inv_gamma * (cos * ux + sin * uy),
        wj * c * inv_gamma * (cos * uy - sin * ux),
        wj * c * inv_gamma * uz,
    ]
    vals = [CArr(jnp.stack([b * cm for cm in cos_m]),
                 jnp.stack([b * sm for sm in sin_m])) for b in base]
    channels = _pack_channels(vals, Nm)
    meta = _channel_meta(Nm, 3, [-1.0, -1.0, +1.0], x.dtype)
    out = _deposit_channels_cubic(geom, channels, meta, Nm, geom["Nzb"],
                                  geom["Nrb"], Nz, Nr, zfold)
    Jr, Jt, Jz = _unpack_channels(out, 3, Nm)
    return Jr, Jt, Jz


def deposit_rho_J_linear(x, y, z, w, q, ux, uy, uz, inv_gamma, Nm,
                         invdz, zmin, Nz, invdr, rmin, Nr, ruyten_linear,
                         zfold="periodic", comp=None):
    """Deposit rho and J together in one scatter (same positions).

    Returns (rho, Jr, Jt, Jz) CArr (Nm, Nz, Nr).  Used when the charge
    and current are sampled at the same particle positions.
    """
    geom = _geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                     ruyten_linear, comp=comp)
    cos, sin = geom["cos"], geom["sin"]
    cos_m, sin_m = _mode_phases(cos, sin, Nm)
    wj = q * w
    base = [
        wj,
        wj * c * inv_gamma * (cos * ux + sin * uy),
        wj * c * inv_gamma * (cos * uy - sin * ux),
        wj * c * inv_gamma * uz,
    ]
    vals = [CArr(jnp.stack([b * cm for cm in cos_m]),
                 jnp.stack([b * sm for sm in sin_m])) for b in base]
    channels = _pack_channels(vals, Nm)
    meta = _channel_meta(Nm, 4, [+1.0, -1.0, -1.0, +1.0], x.dtype)
    out = _deposit_channels(geom, channels, meta, Nm, geom["Nzb"],
                            geom["Nrb"], Nz, Nr, zfold)
    rho, Jr, Jt, Jz = _unpack_channels(out, 4, Nm)
    return rho, Jr, Jt, Jz
