"""Charge / current deposition: particles -> grid.

TPU-native scatter design: per-particle cell indices and shape weights
are computed vectorized, then scatter-added into a guard-padded buffer
(Nm, Nz+4, Nr+4); the guard cells are folded back (periodic in z,
reflected across the axis in r) with cheap array ops.  This replaces the
reference's per-thread buffer copies (CPU) and cell-sorted atomics (GPU)
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


def _mode_values(base, cos, sin, Nm):
    """Return (Nm, Np) split-complex CArr: base * e^{i m theta}."""
    re_m, im_m = base, jnp.zeros_like(base)
    res, ims = [re_m], [im_m]
    for _ in range(1, Nm):
        re_m, im_m = re_m * cos - im_m * sin, re_m * sin + im_m * cos
        res.append(re_m)
        ims.append(im_m)
    return CArr(jnp.stack(res), jnp.stack(ims))


def _linear_weights(cell_pos, ruyten_row=None, bn_idx=None):
    """Linear shape weights (s0, s1) for one axis.

    With ruyten_row given (radial axis), applies the Ruyten correction:
    s0 = (1-u) + bn (1-u) u.
    """
    i_low = jnp.ceil(cell_pos).astype(jnp.int32) - 1
    u = cell_pos - i_low.astype(cell_pos.dtype)
    if ruyten_row is None:
        s0 = 1.0 - u
    else:
        bn = ruyten_row[bn_idx]
        s0 = (1.0 - u) + bn * (1.0 - u) * u
    return i_low, s0, 1.0 - s0


def _fold_guard_cells(buf, Nz, Nr, zfold="periodic"):
    if isinstance(buf, CArr):
        return CArr(_fold_guard_cells(buf.re, Nz, Nr, zfold),
                    _fold_guard_cells(buf.im, Nz, Nr, zfold))
    return _fold_guard_cells_real(buf, Nz, Nr, zfold)


def _fold_guard_cells_real(buf, Nz, Nr, zfold):
    """Fold the (Nm, Nz+4, Nr+4) deposition buffer into (Nm, Nz, Nr).

    z guards: periodic wrap (rows 0,1 -> Nz-2,Nz-1; rows Nz+2,Nz+3 -> 0,1)
    or, for open boundaries with exchange handled elsewhere, simply
    accumulated into the edge cells.
    r guards: reflection across the axis (cols 0 -> ir=1, 1 -> ir=0) and
    clamping at rmax (cols Nr+2, Nr+3 -> ir=Nr-1).
    """
    g = NGUARD
    core_z = buf[:, g:Nz + g, :]
    if zfold == "periodic":
        core_z = core_z.at[:, Nz - 2, :].add(buf[:, 0, :])
        core_z = core_z.at[:, Nz - 1, :].add(buf[:, 1, :])
        core_z = core_z.at[:, 0, :].add(buf[:, Nz + 2, :])
        core_z = core_z.at[:, 1, :].add(buf[:, Nz + 3, :])
    elif zfold == "clamp":
        core_z = core_z.at[:, 0, :].add(buf[:, 0, :] + buf[:, 1, :])
        core_z = core_z.at[:, Nz - 1, :].add(
            buf[:, Nz + 2, :] + buf[:, Nz + 3, :])
    else:
        raise ValueError(zfold)

    out = core_z[:, :, g:Nr + g]
    out = out.at[:, :, 1].add(core_z[:, :, 0])
    out = out.at[:, :, 0].add(core_z[:, :, 1])
    out = out.at[:, :, Nr - 1].add(core_z[:, :, Nr + 2] + core_z[:, :, Nr + 3])
    return out


def _scatter_modes(vals_corners: CArr, flat_idx, Nm, Nzb, Nrb) -> CArr:
    """Scatter-add per-mode corner values into a flat buffer.

    vals_corners: CArr (Nm, K*Np); flat_idx: (K*Np,) int32.
    Returns CArr (Nm, Nzb, Nrb).
    """
    def one_mode(vals):
        return jnp.zeros(Nzb * Nrb, dtype=vals.dtype).at[flat_idx].add(vals)

    out_re = jax.vmap(one_mode)(vals_corners.re)
    out_im = jax.vmap(one_mode)(vals_corners.im)
    return CArr(out_re.reshape(Nm, Nzb, Nrb), out_im.reshape(Nm, Nzb, Nrb))


def _linear_geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                     ruyten_linear):
    """Common linear-deposition geometry: indices, weights, angles.

    Returns dict with cos, sin, flat corner indices (4*Np,), and the
    per-mode-row corner weights.
    """
    r, cos, sin = _cylindrical_projection(x, y)
    rdt = x.dtype

    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (z - zmin) - 0.5

    # z weights
    iz_low = jnp.ceil(z_cell).astype(jnp.int32) - 1
    sz1 = z_cell - iz_low.astype(rdt)
    sz0 = 1.0 - sz1

    # r weights with Ruyten correction (two rows: mode 0 / modes > 0)
    ir_low = jnp.ceil(r_cell).astype(jnp.int32) - 1
    u = r_cell - ir_low.astype(rdt)
    bn_idx = jnp.clip(jnp.ceil(r_cell).astype(jnp.int32), 0, Nr)
    base0 = 1.0 - u
    corr = (1.0 - u) * u
    sr0_m0 = base0 + ruyten_linear[0][bn_idx] * corr
    sr0_mh = base0 + ruyten_linear[1][bn_idx] * corr
    sr1_m0 = 1.0 - sr0_m0
    sr1_mh = 1.0 - sr0_mh

    # Below-axis flag: the lower radial corner is at ir = -1
    below_axis = ir_low < 0

    # Buffer indices (guard offset +2); clip high-r like the reference
    Nzb, Nrb = Nz + 2 * NGUARD, Nr + 2 * NGUARD
    iz_buf = iz_low + NGUARD
    ir_buf = jnp.minimum(ir_low + NGUARD, Nr + NGUARD)

    idx00 = iz_buf * Nrb + ir_buf
    idx01 = iz_buf * Nrb + (ir_buf + 1)
    idx10 = (iz_buf + 1) * Nrb + ir_buf
    idx11 = (iz_buf + 1) * Nrb + (ir_buf + 1)
    flat_idx = jnp.concatenate([idx00, idx01, idx10, idx11])

    return dict(
        cos=cos, sin=sin, below_axis=below_axis, flat_idx=flat_idx,
        sz0=sz0, sz1=sz1,
        sr0=(sr0_m0, sr0_mh), sr1=(sr1_m0, sr1_mh),
        Nzb=Nzb, Nrb=Nrb,
    )


def _deposit_linear_one(geom, vals, Nm, flip_parity, rdt):
    """Scatter one scalar quantity (per-mode values) with linear shapes.

    vals: (Nm, Np) complex.  flip_parity: +1 for rho/Jz ((-1)^m flip),
    -1 for Jr/Jt (-(-1)^m flip).
    Returns the unfolded (Nm, Nzb, Nrb) buffer.
    """
    sz0, sz1 = geom["sz0"], geom["sz1"]
    sr0_m0, sr0_mh = geom["sr0"]
    sr1_m0, sr1_mh = geom["sr1"]
    below = geom["below_axis"]

    # Per-mode radial weight rows + below-axis sign flip on the lower corner
    m_range = jnp.arange(Nm)
    msign = jnp.where(m_range % 2 == 0, 1.0, -1.0).astype(rdt)  # (-1)^m
    flip = flip_parity * msign  # (Nm,)

    sr0_rows = jnp.where(
        (m_range == 0)[:, None], sr0_m0[None, :], sr0_mh[None, :]
    )  # (Nm, Np)
    sr1_rows = jnp.where(
        (m_range == 0)[:, None], sr1_m0[None, :], sr1_mh[None, :]
    )
    sr0_rows = jnp.where(below[None, :], flip[:, None] * sr0_rows, sr0_rows)

    v00 = vals * (sz0[None] * sr0_rows)
    v01 = vals * (sz0[None] * sr1_rows)
    v10 = vals * (sz1[None] * sr0_rows)
    v11 = vals * (sz1[None] * sr1_rows)
    vals_corners = CArr(
        jnp.concatenate([v00.re, v01.re, v10.re, v11.re], axis=1),
        jnp.concatenate([v00.im, v01.im, v10.im, v11.im], axis=1),
    )

    return _scatter_modes(vals_corners, geom["flat_idx"], Nm,
                          geom["Nzb"], geom["Nrb"])


def deposit_rho_linear(x, y, z, w, q, Nm, invdz, zmin, Nz, invdr, rmin, Nr,
                       ruyten_linear, zfold="periodic"):
    """Deposit charge density (not yet divided by cell volume).

    Returns (Nm, Nz, Nr) complex.
    """
    geom = _linear_geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                            ruyten_linear)
    wj = q * w
    vals = _mode_values(wj, geom["cos"], geom["sin"], Nm)
    buf = _deposit_linear_one(geom, vals, Nm, +1.0, x.dtype)
    return _fold_guard_cells(buf, Nz, Nr, zfold)


def deposit_J_linear(x, y, z, w, q, ux, uy, uz, inv_gamma, Nm,
                     invdz, zmin, Nz, invdr, rmin, Nr, ruyten_linear,
                     zfold="periodic"):
    """Deposit current density (Jr, Jt, Jz), each (Nm, Nz, Nr) complex."""
    geom = _linear_geometry(x, y, z, invdz, zmin, Nz, invdr, rmin, Nr,
                            ruyten_linear)
    cos, sin = geom["cos"], geom["sin"]
    wj = q * w
    jr0 = wj * c * inv_gamma * (cos * ux + sin * uy)
    jt0 = wj * c * inv_gamma * (cos * uy - sin * ux)
    jz0 = wj * c * inv_gamma * uz

    vals_r = _mode_values(jr0, cos, sin, Nm)
    vals_t = _mode_values(jt0, cos, sin, Nm)
    vals_z = _mode_values(jz0, cos, sin, Nm)

    rdt = x.dtype
    Jr = _fold_guard_cells(
        _deposit_linear_one(geom, vals_r, Nm, -1.0, rdt), Nz, Nr, zfold)
    Jt = _fold_guard_cells(
        _deposit_linear_one(geom, vals_t, Nm, -1.0, rdt), Nz, Nr, zfold)
    Jz = _fold_guard_cells(
        _deposit_linear_one(geom, vals_z, Nm, +1.0, rdt), Nz, Nr, zfold)
    return Jr, Jt, Jz
