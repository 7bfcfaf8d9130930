"""Field gathering: grid -> per-particle E and B.

Vectorized over particles; ALL grid channels (6 field components x
azimuthal modes x re/im) are fetched in a single XLA gather per corner
with a trailing channel axis, then combined with exp(-i m theta)
factors on the fly.

Behavioral reference:
/root/reference/fbpic/particles/gathering/threading_methods.py:26-208 and
gathering/inline_functions.py (axis guard-cell handling, mode factors).
"""
import jax
import jax.numpy as jnp

from ..utils.complex_arr import CArr


def _cylindrical_projection(x, y):
    r = jnp.sqrt(x**2 + y**2)
    invr = jnp.where(r != 0.0, 1.0 / jnp.where(r == 0.0, 1.0, r), 0.0)
    cos = jnp.where(r != 0.0, x * invr, 1.0)
    sin = jnp.where(r != 0.0, y * invr, 0.0)
    return r, cos, sin


def _stack_interp_channels(interp, Nm):
    """Stack interp E/B into (Nz, Nr, C) with C = 6 * Nm * 2 channels.

    Channel layout: comp-major (Er,Et,Ez,Br,Bt,Bz), then mode, then re/im.
    """
    comps = [interp.Er, interp.Et, interp.Ez,
             interp.Br, interp.Bt, interp.Bz]
    cols = []
    for comp in comps:
        for m in range(Nm):
            cols.append(comp.re[m])
            cols.append(comp.im[m])
    return jnp.stack(cols, axis=-1)  # (Nz, Nr, C)


def gather_fields_linear(
    x, y, z, interp, rmax_gather, invdz, zmin, Nz, invdr, rmin, Nr,
    comp=None,
):
    """Gather E and B at particle positions with linear shapes.

    Parameters
    ----------
    interp: InterpFields with CArr (Nm, Nz, Nr) arrays
    Returns (Ex, Ey, Ez, Bx, By, Bz) per-particle real arrays.
    """
    Nm = interp.Er.shape[0]
    rdt = x.dtype

    r, cos, sin = _cylindrical_projection(x, y)

    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (z - zmin) - 0.5

    ir_lower = jnp.floor(r_cell).astype(jnp.int32)
    iz_lower = jnp.floor(z_cell).astype(jnp.int32)
    ir_upper = ir_lower + 1
    iz_upper = iz_lower + 1

    Sr_upper = r_cell - ir_lower.astype(rdt)
    Sz_upper = z_cell - iz_lower.astype(rdt)
    if comp is not None:
        # Kahan residuals folded into the O(1) sub-cell offsets
        cx, cy, cz = comp
        Sz_upper = Sz_upper + invdz * cz
        Sr_upper = Sr_upper + invdr * (
            (x * cx + y * cy) / jnp.maximum(r, 1e-30))
    Sr_lower = 1.0 - Sr_upper
    Sz_lower = 1.0 - Sz_upper

    # Axis guard cells (below r=0): move the lower weight to the guard
    below_axis = ir_lower < 0
    Sr_guard = jnp.where(below_axis, Sr_lower, 0.0)
    Sr_lower = jnp.where(below_axis, 0.0, Sr_lower)
    ir_lower = jnp.clip(ir_lower, 0, Nr - 1)
    ir_upper = jnp.clip(ir_upper, 0, Nr - 1)
    # Periodic in z
    iz_lower = jnp.mod(iz_lower, Nz)
    iz_upper = jnp.mod(iz_upper, Nz)

    # Pack the 2x2 footprint into grid channels (the grid is tiny, so
    # the 3 shifted copies cost ~nothing) and fetch all four corners in
    # ONE gather: the TPU gather cost is per index, channels ride free.
    # The below-axis guard contribution reads the same (iz, 0) cells the
    # clipped lower corner already fetches, so it folds into per-channel
    # weights instead of two extra gathers (6 gathers -> 1).
    F = _stack_interp_channels(interp, Nm)          # (Nz, Nr, C)
    C = F.shape[-1]
    Fz1 = jnp.roll(F, -1, axis=0)                          # (iz+1, ir)
    Fr1 = jnp.concatenate([F[:, 1:], F[:, -1:]], axis=1)   # (iz, ir+1)
    Fz1r1 = jnp.concatenate([Fz1[:, 1:], Fz1[:, -1:]], axis=1)
    Fbig = jnp.concatenate([F, Fr1, Fz1, Fz1r1], axis=-1)
    cbase = Fbig.reshape(Nz * Nr, 4 * C)[iz_lower * Nr + ir_lower]
    c00, c01 = cbase[:, :C], cbase[:, C:2 * C]
    c10, c11 = cbase[:, 2 * C:3 * C], cbase[:, 3 * C:]

    # Per-channel guard sign: transverse components flip by -(-1)^m,
    # z components by (-1)^m
    guard_sign = []
    for comp in range(6):
        is_z = comp in (2, 5)
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            s = msign if is_z else -msign
            guard_sign += [s, s]
    guard_sign = jnp.asarray(guard_sign, dtype=rdt)

    below = below_axis[:, None]
    w_r0 = jnp.where(
        below,
        Sr_upper[:, None] + guard_sign[None, :] * Sr_guard[:, None],
        Sr_lower[:, None])                                  # (Np, C)
    w_r1 = jnp.where(below, 0.0, Sr_upper[:, None])
    Fm = (Sz_lower[:, None] * (w_r0 * c00 + w_r1 * c01)
          + Sz_upper[:, None] * (w_r0 * c10 + w_r1 * c11))

    # Mode sum: Re(Fm_c * e^{-i m theta}) with factor 1 (m=0) / 2 (m>0).
    # phase_m = e^{-i m theta}, built by repeated multiply with (cos - i sin)
    pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
    pr_list, pi_list = [pr], [pi]
    for _ in range(1, Nm):
        pr, pi = pr * cos + pi * sin, pi * cos - pr * sin
        pr_list.append(pr)
        pi_list.append(pi)

    # Combine channels with one contraction over (mode, re/im):
    # Re(a * p) = a.re * p.re - a.im * p.im, with mode weight 1 / 2.
    mode_w = jnp.asarray([1.0] + [2.0] * (Nm - 1), dtype=rdt)
    W = jnp.stack(
        [jnp.stack(pr_list, axis=-1) * mode_w,
         -jnp.stack(pi_list, axis=-1) * mode_w], axis=-1)   # (Np, Nm, 2)
    Fm4 = Fm.reshape(Fm.shape[0], 6, Nm, 2)
    out = jnp.einsum("pcmt,pmt->pc", Fm4, W,
                     precision=jax.lax.Precision.HIGHEST)                 # (Np, 6)

    in_range = (r < rmax_gather).astype(rdt)
    out = out * in_range[:, None]
    Fr_E, Ft_E, Fz_E, Fr_B, Ft_B, Fz_B = [out[:, i] for i in range(6)]

    Ex = cos * Fr_E - sin * Ft_E
    Ey = sin * Fr_E + cos * Ft_E
    Bx = cos * Fr_B - sin * Ft_B
    By = sin * Fr_B + cos * Ft_B
    return Ex, Ey, Fz_E, Bx, By, Fz_B


def gather_fields_sorted(
    xp, yp, zp, valid, interp, rmax_gather, invdz, zmin, Nz,
    invdr, rmin, Nr, comp=None, precision=None, drift=0,
    zfold="periodic",
):
    """Linear-shape gather on the column-padded (Nz, K) layout as one
    MXU contraction -- the resident-layout replacement for the
    per-index ``gather_fields_linear`` (which pays the serialized
    ~6.6 ns/index TPU gather cost; measured ~8 ms at 964k particles
    vs ~1-3 ms for this contraction, tools/gather_contraction.py).

        out[col, k, ch] = sum_j S[col, k, j] * F_ext[col, j, ch]

    with j = (z-offset o in {-1, 0, 1}) x (radial row in {axis guard,
    0..Nr-1}), S holding the 4 bilinear corner weights per particle and
    F_ext[col, (o, r), ch] = F[clip/mod(col + o), r, ch].  The
    below-axis guard sign flips ride on the F side as a signed guard
    row.  Requires the sort columns to be within 1 + `drift` cells of
    the particle positions (exact at sort time; for a stale sort plan
    pass the extra stray bound as `drift` -- the z-offset window
    widens to +-(1 + drift); the banded re-sort keeps the plan exact,
    so production passes drift=0).

    Returns (Ex, Ey, Ez, Bx, By, Bz) as (Nz, K) arrays (invalid slots
    zero).  Behavioral reference:
    /root/reference/fbpic/particles/gathering/threading_methods.py:26.
    """
    import jax.nn

    Nm = interp.Er.shape[0]
    rdt = xp.dtype
    prec = precision or jax.lax.Precision.HIGHEST

    r, cos, sin = _cylindrical_projection(xp, yp)
    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (zp - zmin) - 0.5

    ir_lower = jnp.floor(r_cell).astype(jnp.int32)
    iz_lower = jnp.floor(z_cell).astype(jnp.int32)
    Sr_upper = r_cell - ir_lower.astype(rdt)
    Sz_upper = z_cell - iz_lower.astype(rdt)
    if comp is not None:
        cx, cy, cz = comp
        Sz_upper = Sz_upper + invdz * cz
        Sr_upper = Sr_upper + invdr * (
            (xp * cx + yp * cy) / jnp.maximum(r, 1e-30))
    Sr_lower = 1.0 - Sr_upper
    Sz_lower = 1.0 - Sz_upper
    ok = valid.astype(rdt) * (r < rmax_gather).astype(rdt)

    # Radial extended axis: row 0 = signed axis guard (ir = -1), rows
    # 1..Nr = ir 0..Nr-1.  Lower corner index l = ir_lower + 1 in
    # [0, Nr]; upper corner = min(l + 1, Nr) (top clip, matching
    # gather_fields_linear's ir clip).
    l_r = jnp.clip(ir_lower + 1, 0, Nr)
    u_r = jnp.minimum(l_r + 1, Nr)

    # z offset of the footprint base from the sort column.  Periodic
    # z: a particle that crossed the wrap seam since the (lazy) sort
    # has iz_lower - col = +-(Nz - 1); the physical offset is small,
    # so wrap to the centered residue before clipping (F_ext's rolled
    # copies are periodic, so the wrapped offset fetches the right
    # rows).  Open z ('clamp'): plain clip, like the deposit path.
    D = 1 + int(drift)
    n_off = 2 * D + 1
    col = jnp.arange(Nz, dtype=jnp.int32)[:, None]
    delta = iz_lower - col
    if zfold == "periodic":
        delta = jnp.mod(delta + Nz // 2, Nz) - Nz // 2
    delta = jnp.clip(delta, -D, D)

    Nrx = Nr + 1
    J = n_off * Nrx
    o_lo = delta + D                    # o in [-D, D] -> [0, 2D]

    # F with the signed axis-guard row prepended.  The guard-row sign
    # per channel: transverse components flip by -(-1)^m, z components
    # by (-1)^m (gathering/inline_functions.py).
    F = _stack_interp_channels(interp, Nm)          # (Nz, Nr, C)
    guard_sign = []
    for comp_i in range(6):
        is_z = comp_i in (2, 5)
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            s = msign if is_z else -msign
            guard_sign += [s, s]
    guard_sign = jnp.asarray(guard_sign, dtype=rdt)
    Fg = jnp.concatenate([guard_sign[None, None, :] * F[:, :1], F],
                         axis=1)                    # (Nz, Nr+1, C)

    from .pallas_gather import pallas_gather_enabled, \
        gather_sorted_pallas
    if pallas_gather_enabled(rdt):
        # Pallas kernel: the one-hot S and the (Nz, K, C) mode-sum
        # intermediate never hit HBM (see pallas_gather.py).  Returns
        # None when the geometry exceeds the kernel's VMEM budget.
        out = gather_sorted_pallas(
            o_lo.astype(rdt), l_r.astype(rdt), Sr_upper, Sz_upper, ok,
            cos, sin, Fg, n_off=n_off, Nm=Nm, Nz=Nz, Nr=Nr)
        if out is not None:
            return out

    def onehot(o_idx, ridx, wgt):
        j = o_idx * Nrx + ridx
        return wgt[:, :, None] * jax.nn.one_hot(j, J, dtype=rdt)

    o_hi = jnp.minimum(o_lo + 1, n_off - 1)
    S = (onehot(o_lo, l_r, Sz_lower * Sr_lower * ok)
         + onehot(o_lo, u_r, Sz_lower * Sr_upper * ok)
         + onehot(o_hi, l_r, Sz_upper * Sr_lower * ok)
         + onehot(o_hi, u_r, Sz_upper * Sr_upper * ok))

    F_ext = jnp.concatenate(
        [jnp.roll(Fg, -o, axis=0) for o in range(-D, D + 1)], axis=1)

    Fm = jnp.einsum("bkj,bjc->bkc", S, F_ext, precision=prec,
                    preferred_element_type=rdt)     # (Nz, K, C)

    # Mode sum with exp(-i m theta) (see gather_fields_linear)
    pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
    pr_list, pi_list = [pr], [pi]
    for _ in range(1, Nm):
        pr, pi = pr * cos + pi * sin, pi * cos - pr * sin
        pr_list.append(pr)
        pi_list.append(pi)
    mode_w = jnp.asarray([1.0] + [2.0] * (Nm - 1), dtype=rdt)
    W = jnp.stack(
        [jnp.stack(pr_list, axis=-1) * mode_w,
         -jnp.stack(pi_list, axis=-1) * mode_w], axis=-1)  # (Nz, K, Nm, 2)
    Fm4 = Fm.reshape(*Fm.shape[:2], 6, Nm, 2)
    out = jnp.einsum("bkcmt,bkmt->bkc", Fm4, W,
                     precision=jax.lax.Precision.HIGHEST)  # (Nz, K, 6)

    Fr_E, Ft_E, Fz_E, Fr_B, Ft_B, Fz_B = [out[..., i] for i in range(6)]
    Ex = cos * Fr_E - sin * Ft_E
    Ey = sin * Fr_E + cos * Ft_E
    Bx = cos * Fr_B - sin * Ft_B
    By = sin * Fr_B + cos * Ft_B
    return Ex, Ey, Fz_E, Bx, By, Fz_B


def gather_fields_cubic(
    x, y, z, interp, rmax_gather, invdz, zmin, Nz, invdr, rmin, Nr,
    comp=None,
):
    """Gather E and B with cubic (third-order) shapes.

    4x4 stencil with below-axis index folding and sign flips
    (reference: gathering/threading_methods.py:208+ and
    gathering/inline_functions.py:93-187).
    """
    Nm = interp.Er.shape[0]
    rdt = x.dtype

    r, cos, sin = _cylindrical_projection(x, y)

    r_cell = invdr * (r - rmin) - 0.5
    z_cell = invdz * (z - zmin) - 0.5

    ir_lowest = jnp.floor(r_cell).astype(jnp.int32) - 1
    r_local = r_cell - ir_lowest.astype(rdt)
    if comp is not None:
        # Kahan residuals folded into the O(1) sub-cell offsets
        cx, cy, cz = comp
        r_local = r_local + invdr * (
            (x * cx + y * cy) / jnp.maximum(r, 1e-30))
    Sr = [
        -1. / 6. * (r_local - 2.) ** 3,
        1. / 6. * (3. * (r_local - 1.) ** 3 - 6. * (r_local - 1.) ** 2 + 4.),
        1. / 6. * (3. * (2. - r_local) ** 3 - 6. * (2. - r_local) ** 2 + 4.),
        -1. / 6. * (1. - r_local) ** 3,
    ]
    iz_lowest = jnp.floor(z_cell).astype(jnp.int32) - 1
    z_local = z_cell - iz_lowest.astype(rdt)
    if comp is not None:
        z_local = z_local + invdz * cz
    Sz = [
        -1. / 6. * (z_local - 2.) ** 3,
        1. / 6. * (3. * (z_local - 1.) ** 3 - 6. * (z_local - 1.) ** 2 + 4.),
        1. / 6. * (3. * (2. - z_local) ** 3 - 6. * (2. - z_local) ** 2 + 4.),
        -1. / 6. * (1. - z_local) ** 3,
    ]

    F = _stack_interp_channels(interp, Nm)          # (Nz, Nr, C)
    C = F.shape[-1]
    Fflat = F.reshape(Nz * Nr, C)

    # Per-channel flip applied when the radial index is < 0:
    # z channels get (-1)^m, transverse channels get -(-1)^m
    flip_chan = []
    for comp in range(6):
        is_z = comp in (2, 5)
        for m in range(Nm):
            msign = 1.0 if m % 2 == 0 else -1.0
            val = msign if is_z else -msign
            flip_chan += [val, val]
    flip_chan = jnp.asarray(flip_chan, dtype=rdt)

    Fm = jnp.zeros((x.shape[0], C), dtype=rdt)
    for jr in range(4):
        ir = ir_lowest + jr
        below = ir < 0
        ir_eff = jnp.where(below, -ir - 1, ir)
        ir_eff = jnp.minimum(ir_eff, Nr - 1)
        sign = jnp.where(below[:, None], flip_chan[None, :], 1.0)
        for jz in range(4):
            iz = jnp.mod(iz_lowest + jz, Nz)
            vals = Fflat[iz * Nr + ir_eff]           # (Np, C)
            Fm = Fm + (Sr[jr] * Sz[jz])[:, None] * sign * vals

    # Mode sum with e^{-i m theta}
    pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
    pr_list, pi_list = [pr], [pi]
    for _ in range(1, Nm):
        pr, pi = pr * cos + pi * sin, pi * cos - pr * sin
        pr_list.append(pr)
        pi_list.append(pi)
    m_range = jnp.arange(Nm)
    mode_w = jnp.asarray([1.0] + [2.0] * (Nm - 1), dtype=rdt)
    W = jnp.stack(
        [jnp.stack(pr_list, axis=-1) * mode_w,
         -jnp.stack(pi_list, axis=-1) * mode_w], axis=-1)
    Fm4 = Fm.reshape(Fm.shape[0], 6, Nm, 2)
    out = jnp.einsum("pcmt,pmt->pc", Fm4, W,
                     precision=jax.lax.Precision.HIGHEST)

    in_range = (r < rmax_gather).astype(rdt)
    out = out * in_range[:, None]
    Fr_E, Ft_E, Fz_E, Fr_B, Ft_B, Fz_B = [out[:, i] for i in range(6)]

    Ex = cos * Fr_E - sin * Ft_E
    Ey = sin * Fr_E + cos * Ft_E
    Bx = cos * Fr_B - sin * Ft_B
    By = sin * Fr_B + cos * Ft_B
    return Ex, Ey, Fz_E, Bx, By, Fz_B
