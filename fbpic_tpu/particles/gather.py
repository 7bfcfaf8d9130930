"""Field gathering: grid -> per-particle E and B.

Vectorized over particles; the 6 field components are stacked so each
grid lookup is a single XLA gather of shape (6, Nm, Np).  Azimuthal
modes are summed on the fly with exp(-i m theta) factors.

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


def gather_fields_linear(
    x, y, z, interp, rmax_gather, invdz, zmin, Nz, invdr, rmin, Nr,
):
    """Gather E and B at particle positions with linear shapes.

    Parameters
    ----------
    interp: InterpFields with (Nm, Nz, Nr) complex arrays
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

    Sr_lower = ir_upper.astype(rdt) - r_cell
    Sr_upper = r_cell - ir_lower.astype(rdt)
    Sz_lower = iz_upper.astype(rdt) - z_cell
    Sz_upper = z_cell - iz_lower.astype(rdt)

    # Axis guard cells (below r=0): move the lower weight to the guard
    below_axis = ir_lower < 0
    Sr_guard = jnp.where(below_axis, Sr_lower, 0.0)
    Sr_lower = jnp.where(below_axis, 0.0, Sr_lower)
    ir_lower = jnp.clip(ir_lower, 0, Nr - 1)
    ir_upper = jnp.clip(ir_upper, 0, Nr - 1)
    # Periodic in z
    iz_lower = jnp.mod(iz_lower, Nz)
    iz_upper = jnp.mod(iz_upper, Nz)

    S_ll = Sz_lower * Sr_lower
    S_lu = Sz_lower * Sr_upper
    S_ul = Sz_upper * Sr_lower
    S_uu = Sz_upper * Sr_upper
    S_lg = Sz_lower * Sr_guard
    S_ug = Sz_upper * Sr_guard

    # Stack all 6 components: CArr (6, Nm, Nz, Nr)
    F = CArr(
        jnp.stack([interp.Er.re, interp.Et.re, interp.Ez.re,
                   interp.Br.re, interp.Bt.re, interp.Bz.re]),
        jnp.stack([interp.Er.im, interp.Et.im, interp.Ez.im,
                   interp.Br.im, interp.Bt.im, interp.Bz.im]),
    )

    def corner(iz, ir):
        return F[:, :, iz, ir]  # CArr (6, Nm, Np)

    Fm = (
        corner(iz_lower, ir_lower) * S_ll
        + corner(iz_lower, ir_upper) * S_lu
        + corner(iz_upper, ir_lower) * S_ul
        + corner(iz_upper, ir_upper) * S_uu
    )

    # Guard-cell (below-axis) contributions from radial index 0, with
    # sign flips: transverse components flip by -(-1)^m, z by (-1)^m
    Faxis = F[:, :, :, 0]  # CArr (6, Nm, Nz)
    guard = Faxis[:, :, iz_lower] * S_lg + Faxis[:, :, iz_upper] * S_ug
    m_range = jnp.arange(Nm)
    flip = jnp.where(m_range % 2 == 0, 1.0, -1.0).astype(rdt)  # (-1)^m
    # sign for (r, t) components: -(-1)^m ; for z: +(-1)^m
    sign_rt = (-flip)[None, :, None]
    sign_z = flip[None, :, None]
    comp_is_z = jnp.array([0, 0, 1, 0, 0, 1], dtype=bool)[:, None, None]
    guard_sign = jnp.where(comp_is_z, sign_z, sign_rt)
    Fm = Fm + guard * guard_sign

    # Mode sum: factor 1 for m=0, 2*Re(Fm * e^{-i m theta}) otherwise.
    # phase_m = e^{-i m theta}, built by repeated multiply with (cos - i sin)
    pr, pi = jnp.ones_like(cos), jnp.zeros_like(sin)
    pr_list, pi_list = [pr], [pi]
    for _ in range(1, Nm):
        pr, pi = pr * cos + pi * sin, pi * cos - pr * sin
        pr_list.append(pr)
        pi_list.append(pi)
    phase_re = jnp.stack(pr_list)  # (Nm, Np)
    phase_im = jnp.stack(pi_list)
    weight = jnp.where(m_range == 0, 1.0, 2.0).astype(rdt)[:, None]
    # Re(Fm * phase) = Fm.re * phase.re - Fm.im * phase.im
    Fsum = jnp.sum(
        weight * (Fm.re * phase_re[None] - Fm.im * phase_im[None]), axis=1)

    # Do not gather beyond the physical radius
    in_range = (r < rmax_gather).astype(rdt)
    Fsum = Fsum * in_range

    Fr_E, Ft_E, Fz_E, Fr_B, Ft_B, Fz_B = Fsum
    Ex = cos * Fr_E - sin * Ft_E
    Ey = sin * Fr_E + cos * Ft_E
    Bx = cos * Fr_B - sin * Ft_B
    By = sin * Fr_B + cos * Ft_B
    return Ex, Ey, Fz_E, Bx, By, Fz_B
