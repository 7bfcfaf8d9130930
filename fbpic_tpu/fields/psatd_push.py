"""PSATD field advance and current corrections, as pure batched functions.

All arrays are stacked over azimuthal modes: complex (Nm, Nz, Nr).
These are the elementwise k-space updates of the spectral solver -- XLA
fuses each of them into a single kernel.  Behavioral reference:
/root/reference/fbpic/fields/numba_methods.py:64-382.
"""
import jax.numpy as jnp

from ..constants import c2, mu_0, epsilon_0


def push_eb_standard(
    Ep, Em, Ez, Bp, Bm, Bz, Jp, Jm, Jz, rho_prev, rho_next,
    rho_prev_coef, rho_next_coef, j_coef, C, S_w, kr, kz, dt,
    use_true_rho=False,
):
    """Advance E, B over one timestep with the standard PSATD scheme."""
    if use_true_rho:
        rho_diff = rho_next_coef * rho_next - rho_prev_coef * rho_prev
    else:
        divE = kr * (Ep - Em) + 1.0j * kz * Ez
        divJ = kr * (Jp - Jm) + 1.0j * kz * Jz
        rho_diff = (
            (rho_next_coef - rho_prev_coef) * epsilon_0 * divE
            - rho_next_coef * dt * divJ
        )

    Ep_new = C * Ep + 0.5 * kr * rho_diff + c2 * S_w * (
        -1.0j * 0.5 * kr * Bz + kz * Bp - mu_0 * Jp
    )
    Em_new = C * Em - 0.5 * kr * rho_diff + c2 * S_w * (
        -1.0j * 0.5 * kr * Bz - kz * Bm - mu_0 * Jm
    )
    Ez_new = C * Ez - 1.0j * kz * rho_diff + c2 * S_w * (
        1.0j * kr * Bp + 1.0j * kr * Bm - mu_0 * Jz
    )

    Bp_new = C * Bp - S_w * (-1.0j * 0.5 * kr * Ez + kz * Ep) + j_coef * (
        -1.0j * 0.5 * kr * Jz + kz * Jp
    )
    Bm_new = C * Bm - S_w * (-1.0j * 0.5 * kr * Ez - kz * Em) + j_coef * (
        -1.0j * 0.5 * kr * Jz - kz * Jm
    )
    Bz_new = C * Bz - S_w * (1.0j * kr * Ep + 1.0j * kr * Em) + j_coef * (
        1.0j * kr * Jp + 1.0j * kr * Jm
    )

    return Ep_new, Em_new, Ez_new, Bp_new, Bm_new, Bz_new


def push_eb_pml_standard(Ep_pml, Em_pml, Bp_pml, Bm_pml, Ez, Bz, C, S_w, kr, kz):
    """Advance the radial-PML split fields (standard scheme)."""
    Ep_pml_new = C * Ep_pml + c2 * S_w * (-1.0j * 0.5 * kr * Bz)
    Em_pml_new = C * Em_pml + c2 * S_w * (-1.0j * 0.5 * kr * Bz)
    Bp_pml_new = C * Bp_pml - S_w * (-1.0j * 0.5 * kr * Ez)
    Bm_pml_new = C * Bm_pml - S_w * (-1.0j * 0.5 * kr * Ez)
    return Ep_pml_new, Em_pml_new, Bp_pml_new, Bm_pml_new


def push_eb_comoving(
    Ep, Em, Ez, Bp, Bm, Bz, Jp, Jm, Jz, rho_prev, rho_next,
    rho_prev_coef, rho_next_coef, j_coef, C, S_w, T_eb, T_cc, T_rho,
    kr, kz, dt, V, use_true_rho=False,
):
    """Advance E, B with the Galilean / comoving-current PSATD scheme."""
    if use_true_rho:
        rho_diff = rho_next_coef * rho_next - rho_prev_coef * rho_prev
    else:
        divE = kr * (Ep - Em) + 1.0j * kz * Ez
        divJ = kr * (Jp - Jm) + 1.0j * kz * Jz
        rho_diff = (
            (T_eb * rho_next_coef - rho_prev_coef) * epsilon_0 * divE
            + T_rho * rho_next_coef * divJ
        )

    Ep_new = (
        T_eb * C * Ep + 0.5 * kr * rho_diff
        + j_coef * 1.0j * kz * V * Jp
        + c2 * T_eb * S_w * (-1.0j * 0.5 * kr * Bz + kz * Bp - mu_0 * T_cc * Jp)
    )
    Em_new = (
        T_eb * C * Em - 0.5 * kr * rho_diff
        + j_coef * 1.0j * kz * V * Jm
        + c2 * T_eb * S_w * (-1.0j * 0.5 * kr * Bz - kz * Bm - mu_0 * T_cc * Jm)
    )
    Ez_new = (
        T_eb * C * Ez - 1.0j * kz * rho_diff
        + j_coef * 1.0j * kz * V * Jz
        + c2 * T_eb * S_w * (
            1.0j * kr * Bp + 1.0j * kr * Bm - mu_0 * T_cc * Jz
        )
    )

    Bp_new = (
        T_eb * C * Bp
        - T_eb * S_w * (-1.0j * 0.5 * kr * Ez + kz * Ep)
        + j_coef * (-1.0j * 0.5 * kr * Jz + kz * Jp)
    )
    Bm_new = (
        T_eb * C * Bm
        - T_eb * S_w * (-1.0j * 0.5 * kr * Ez - kz * Em)
        + j_coef * (-1.0j * 0.5 * kr * Jz - kz * Jm)
    )
    Bz_new = (
        T_eb * C * Bz
        - T_eb * S_w * (1.0j * kr * Ep + 1.0j * kr * Em)
        + j_coef * (1.0j * kr * Jp + 1.0j * kr * Jm)
    )

    return Ep_new, Em_new, Ez_new, Bp_new, Bm_new, Bz_new


def push_eb_pml_comoving(Ep_pml, Em_pml, Bp_pml, Bm_pml, Ez, Bz, C, S_w, T_eb,
                         kr, kz):
    """Advance the radial-PML split fields (Galilean / comoving scheme)."""
    Ep_pml_new = T_eb * C * Ep_pml + c2 * T_eb * S_w * (-1.0j * 0.5 * kr * Bz)
    Em_pml_new = T_eb * C * Em_pml + c2 * T_eb * S_w * (-1.0j * 0.5 * kr * Bz)
    Bp_pml_new = T_eb * C * Bp_pml - T_eb * S_w * (-1.0j * 0.5 * kr * Ez)
    Bm_pml_new = T_eb * C * Bm_pml - T_eb * S_w * (-1.0j * 0.5 * kr * Ez)
    return Ep_pml_new, Em_pml_new, Bp_pml_new, Bm_pml_new


def correct_currents_curlfree_standard(
    rho_prev, rho_next, Jp, Jm, Jz, kz, kr, inv_k2, inv_dt
):
    """Curl-free current correction (standard scheme)."""
    F = -inv_k2 * (
        (rho_next - rho_prev) * inv_dt
        + 1.0j * kz * Jz
        + kr * (Jp - Jm)
    )
    return Jp + 0.5 * kr * F, Jm - 0.5 * kr * F, Jz - 1.0j * kz * F


def correct_currents_curlfree_comoving(
    rho_prev, rho_next, Jp, Jm, Jz, kz, kr, inv_k2, j_corr_coef, T_eb, T_cc,
    inv_dt
):
    """Curl-free current correction (Galilean / comoving scheme)."""
    F = -inv_k2 * (
        T_cc * j_corr_coef * (rho_next - rho_prev * T_eb)
        + 1.0j * kz * Jz
        + kr * (Jp - Jm)
    )
    return Jp + 0.5 * kr * F, Jm - 0.5 * kr * F, Jz - 1.0j * kz * F


def correct_currents_crossdeposition_standard(
    rho_prev, rho_next, rho_next_z, rho_next_xy, Jp, Jm, Jz, kz, kr, inv_dt
):
    """Cross-deposition current correction (standard scheme)."""
    Dz = 1.0j * kz * Jz + 0.5 * inv_dt * (
        rho_next - rho_next_xy + rho_next_z - rho_prev
    )
    Dxy = kr * (Jp - Jm) + 0.5 * inv_dt * (
        rho_next - rho_next_z + rho_next_xy - rho_prev
    )
    inv_kr = jnp.where(kr != 0, 1.0 / jnp.where(kr == 0, 1.0, kr), 0.0)
    inv_kz = jnp.where(kz != 0, 1.0 / jnp.where(kz == 0, 1.0, kz), 0.0)
    return (
        Jp - 0.5 * Dxy * inv_kr,
        Jm + 0.5 * Dxy * inv_kr,
        Jz + 1.0j * Dz * inv_kz,
    )


def correct_currents_crossdeposition_comoving(
    rho_prev, rho_next, rho_next_z, rho_next_xy, Jp, Jm, Jz, kz, kr,
    j_corr_coef, T_eb, T_cc, inv_dt
):
    """Cross-deposition current correction (Galilean / comoving scheme)."""
    Dz = 1.0j * kz * Jz + 0.5 * T_cc * j_corr_coef * (
        rho_next - T_eb * rho_next_xy + rho_next_z - T_eb * rho_prev
    )
    Dxy = kr * (Jp - Jm) + 0.5 * T_cc * j_corr_coef * (
        rho_next + T_eb * rho_next_xy - rho_next_z - T_eb * rho_prev
    )
    inv_kr = jnp.where(kr != 0, 1.0 / jnp.where(kr == 0, 1.0, kr), 0.0)
    inv_kz = jnp.where(kz != 0, 1.0 / jnp.where(kz == 0, 1.0, kz), 0.0)
    return (
        Jp - 0.5 * Dxy * inv_kr,
        Jm + 0.5 * Dxy * inv_kr,
        Jz + 1.0j * Dz * inv_kz,
    )


def correct_divE(rho_prev, Ep, Em, Ez, kz, kr, inv_k2):
    """Correct E so that div(E) = rho/epsilon_0."""
    F = -inv_k2 * (
        -rho_prev / epsilon_0 + 1.0j * kz * Ez + kr * (Ep - Em)
    )
    return Ep + 0.5 * kr * F, Em - 0.5 * kr * F, Ez - 1.0j * kz * F


def filter_scalar(field, filter_z, filter_r):
    """Multiply a spectral scalar by the separable k-space filter.

    filter_z: (Nz,) real; filter_r: (Nm, Nr) real.
    """
    return field * (filter_z[None, :, None] * filter_r[:, None, :])


def filter_vector(Fp, Fm, Fz, filter_z, filter_r):
    f = filter_z[None, :, None] * filter_r[:, None, :]
    return Fp * f, Fm * f, Fz * f
