"""Particle-layer tests: pusher physics, uniform deposition, gather.

Mirrors reference tests `test_uniform_rho_deposition.py` (Ruyten shapes +
modified volume => uniform rho) and the pusher checks in
tests/unautomated/test_pusher.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fbpic_tpu.constants import c, e, m_e
from fbpic_tpu.particles.push import push_p_vay, push_x
from fbpic_tpu.particles.state import (
    generate_evenly_spaced, make_particle_state,
)
from fbpic_tpu.particles.deposit import deposit_rho_linear, deposit_J_linear
from fbpic_tpu.particles.gather import gather_fields_linear
from fbpic_tpu.fields import GridConfig, build_field_aux, InterpFields


def test_vay_pusher_circular_motion():
    """A particle in a uniform B field gyrates at the cyclotron frequency."""
    B0 = 1.0  # Tesla
    u0 = 0.5
    gamma = np.sqrt(1 + u0**2)
    omega_c = e * B0 / (gamma * m_e)
    dt = 1e-4 / omega_c

    ux, uy, uz = jnp.array([u0]), jnp.array([0.0]), jnp.array([0.0])
    inv_gamma = jnp.array([1.0 / gamma])
    zeros = jnp.array([0.0])
    econst = -e * dt / (m_e * c)  # electron
    bconst = -0.5 * e * dt / m_e

    N = 2000
    for _ in range(N):
        ux, uy, uz, inv_gamma = push_p_vay(
            ux, uy, uz, inv_gamma, zeros, zeros, zeros,
            zeros, zeros, jnp.array([B0]), econst, bconst)

    angle = omega_c * dt * N
    # Electron rotates; |u| conserved
    assert abs(float(jnp.sqrt(ux**2 + uy**2)[0]) - u0) < 1e-8
    measured_angle = np.arctan2(float(uy[0]), float(ux[0]))
    assert abs(measured_angle - angle) < 1e-3 * angle


def test_uniform_rho_deposition():
    """Uniform plasma deposits uniform rho (Ruyten + modified volume)."""
    Nz, Nr, Nm = 32, 32, 2
    zmin, zmax = 0.0, 32e-6
    rmax = 32e-6
    n0 = 1e24
    config = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=(zmax - zmin) / Nz,
                        dr=rmax / Nr, rmax=rmax, dt=1e-15)
    aux = build_field_aux(config)

    rng = np.random.RandomState(0)
    Ntot, x, y, z, ux, uy, uz, inv_gamma, w = generate_evenly_spaced(
        Nz, zmin, zmax, Nr * 8, 0.0, rmax, 4, n0, None, rng=rng)
    ptcl = make_particle_state(x, y, z, ux, uy, uz, inv_gamma, w)

    rho = deposit_rho_linear(
        ptcl.x, ptcl.y, ptcl.z, ptcl.w, -e, Nm,
        1.0 / config.dz, zmin, Nz, 1.0 / config.dr, 0.0, Nr,
        aux.ruyten_linear)
    rho = (rho * aux.invvol[:, None, :]).to_numpy()

    # Mode 0 must be uniform = -e n0 (except last radial cell, where
    # particles beyond the left half of the cell are missing)
    rho0 = rho[0].real
    expected = -e * n0
    # Same tolerance as the reference test
    # (/root/reference/tests/test_uniform_rho_deposition.py:72)
    assert np.allclose(rho0[:, :-1], expected, rtol=2e-3)
    # Higher modes are zero (azimuthally symmetric distribution)
    assert np.abs(rho[1]).max() < 1e-8 * abs(expected)

    # Charge conservation: sum(rho * vol) = total charge
    vol = 1.0 / np.asarray(aux.invvol[0])
    total = (rho0 * vol[None, :]).sum()
    assert np.isclose(total, -e * float(jnp.sum(ptcl.w)), rtol=1e-12)


def test_deposit_J_matches_rho_times_v():
    """For uniform uz, Jz = rho * c * uz * inv_gamma."""
    Nz, Nr, Nm = 16, 16, 2
    zmin, zmax = 0.0, 16e-6
    rmax = 16e-6
    config = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=(zmax - zmin) / Nz,
                        dr=rmax / Nr, rmax=rmax, dt=1e-15)
    aux = build_field_aux(config)
    uz0 = 0.7
    rng = np.random.RandomState(1)
    Ntot, x, y, z, ux, uy, uz, inv_gamma, w = generate_evenly_spaced(
        32, zmin, zmax, 32, 0.0, rmax, 4, 1e24, None,
        uz_m=uz0, rng=rng)
    ptcl = make_particle_state(x, y, z, ux, uy, uz, inv_gamma, w)

    args = (ptcl.x, ptcl.y, ptcl.z, ptcl.w, -e, Nm,
            1 / config.dz, zmin, Nz, 1 / config.dr, 0.0, Nr,
            aux.ruyten_linear)
    rho = deposit_rho_linear(*args)
    Jr, Jt, Jz = deposit_J_linear(
        ptcl.x, ptcl.y, ptcl.z, ptcl.w, -e,
        ptcl.ux, ptcl.uy, ptcl.uz, ptcl.inv_gamma, Nm,
        1 / config.dz, zmin, Nz, 1 / config.dr, 0.0, Nr,
        aux.ruyten_linear)
    v = c * uz0 / np.sqrt(1 + uz0**2)
    np.testing.assert_allclose(Jz.to_numpy(), rho.to_numpy() * v,
                               rtol=1e-10, atol=1e-18)
    assert np.abs(Jr.to_numpy()).max() < 1e-12 * np.abs(Jz.to_numpy()).max()


def test_gather_uniform_Ez():
    """A uniform Ez in mode 0 is gathered exactly at any position."""
    Nz, Nr, Nm = 16, 16, 2
    zmin = 0.0
    rmax = 16e-6
    dz = 1e-6
    dr = rmax / Nr
    E0 = 5.0e9
    config = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=dz, dr=dr, rmax=rmax,
                        dt=1e-15)
    interp = InterpFields.zeros(config)
    interp.Ez.re = interp.Ez.re.at[0].set(E0)

    rng = np.random.RandomState(2)
    Np = 100
    r = rng.uniform(0, 0.9 * rmax, Np)
    theta = rng.uniform(0, 2 * np.pi, Np)
    x = jnp.asarray(r * np.cos(theta))
    y = jnp.asarray(r * np.sin(theta))
    z = jnp.asarray(rng.uniform(zmin, zmin + Nz * dz, Np))

    Ex, Ey, Ez, Bx, By, Bz = gather_fields_linear(
        x, y, z, interp, rmax, 1 / dz, zmin, Nz, 1 / dr, 0.0, Nr)
    np.testing.assert_allclose(np.asarray(Ez), E0, rtol=1e-12)
    assert np.abs(np.asarray(Ex)).max() < 1e-6
    assert np.abs(np.asarray(Bz)).max() < 1e-20


def test_gather_mode1_theta_dependence():
    """A mode-1 field produces the expected cos(theta) dependence."""
    Nz, Nr, Nm = 8, 8, 2
    rmax = 8e-6
    dz, dr = 1e-6, rmax / Nr
    config = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=dz, dr=dr, rmax=rmax,
                        dt=1e-15)
    interp = InterpFields.zeros(config)
    F1 = 3.0e7  # real coefficient in mode 1
    interp.Ez.re = interp.Ez.re.at[1].set(F1)

    # Particles on a ring at fixed r, varying theta
    Np = 16
    theta = np.linspace(0, 2 * np.pi, Np, endpoint=False)
    r0 = 3.3 * dr
    x = jnp.asarray(r0 * np.cos(theta))
    y = jnp.asarray(r0 * np.sin(theta))
    z = jnp.full(Np, 4.2 * dz)

    _, _, Ez, _, _, _ = gather_fields_linear(
        x, y, z, interp, rmax, 1 / dz, 0.0, Nz, 1 / dr, 0.0, Nr)
    # F(theta) = 2 Re[F1 e^{-i theta}] = 2 F1 cos(theta)
    np.testing.assert_allclose(np.asarray(Ez), 2 * F1 * np.cos(theta),
                               rtol=1e-10, atol=1e-6)
