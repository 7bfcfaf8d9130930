"""Compton scattering against a rigid counter-propagating Gaussian laser.

Monte-Carlo Klein-Nishina scattering, evaluated in the electron rest
frame (boosted-frame compatible); the laser is not represented on the
grid but as a rigid photon flux (reference:
/root/reference/fbpic/particles/elementary_process/compton/).

Simplification vs the reference: the rest-frame emission angle is
sampled uniformly in cos(theta) instead of from the Klein-Nishina
angular distribution (total rate and Compton-shifted energies are
exact; the angular distribution is approximate).  Electron recoil is
applied.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_dataclass
from ..utils.dtypes import real_dtype
from ..constants import c, m_e, hbar

R_E = 2.8179403262e-15
PI_RE_2 = np.pi * R_E**2
INV_MC = 1.0 / (m_e * c)


@static_dataclass
class ComptonConfig:
    """Static Compton-scattering settings of one (electron) species."""
    target_index: int            # species receiving the photons
    ratio_w_electron_photon: float = 1.0
    buffer_size: int = 8192


@pytree_dataclass
class ComptonAux:
    """Laser-flux parameters (device scalars)."""
    photon_n_lab_peak: jax.Array   # peak photon density [1/m^3]
    photon_p: jax.Array            # photon momentum [kg m/s] (sim frame)
    photon_beta_z: jax.Array       # +-1 photon propagation direction
    inv_waist2: jax.Array
    inv_ctau2: jax.Array
    z0: jax.Array
    gamma_boost: jax.Array
    beta_boost: jax.Array


def build_compton_aux(laser_energy, laser_wavelength, laser_waist,
                      laser_ctau, laser_initial_z0, boost=None):
    """Host-side setup (reference: compton.py:55-140)."""
    rdt = real_dtype()
    photon_lab_p = 2 * np.pi * hbar / laser_wavelength
    effective_volume = (np.pi / 2.0) ** 1.5 * laser_waist**2 * laser_ctau
    photon_n_lab_peak = laser_energy / (effective_volume * photon_lab_p * c)
    gamma_boost = 1.0 if boost is None else boost.gamma0
    beta_boost = 0.0 if boost is None else boost.beta0
    # Counter-propagating (-z) photon momentum, transformed to sim frame
    photon_p_sim = gamma_boost * (1 + beta_boost) * photon_lab_p
    return ComptonAux(
        photon_n_lab_peak=jnp.asarray(photon_n_lab_peak, rdt),
        photon_p=jnp.asarray(photon_p_sim, rdt),
        photon_beta_z=jnp.asarray(-1.0, rdt),
        inv_waist2=jnp.asarray(1.0 / laser_waist**2, rdt),
        inv_ctau2=jnp.asarray(1.0 / laser_ctau**2, rdt),
        z0=jnp.asarray(laser_initial_z0, rdt),
        gamma_boost=jnp.asarray(gamma_boost, rdt),
        beta_boost=jnp.asarray(beta_boost, rdt),
    )


def compton_scatter(sp, cfg: ComptonConfig, aux: ComptonAux, time, key):
    """One Compton step: returns (sp_updated, new_photons dict)."""
    ct = c * time
    # Photon density at each electron (lab-frame Gaussian, rigid motion)
    zlab = aux.gamma_boost * (sp.z + aux.beta_boost * ct)
    ctlab = aux.gamma_boost * (ct + aux.beta_boost * sp.z)
    n_lab = aux.photon_n_lab_peak * jnp.exp(
        -2 * aux.inv_waist2 * (sp.x**2 + sp.y**2)
        - 2 * aux.inv_ctau2 * (zlab - aux.z0 + ctlab) ** 2)
    photon_n = aux.gamma_boost * n_lab * (1 + aux.beta_boost)

    # Klein-Nishina probability in the electron rest frame
    gamma = 1.0 / sp.inv_gamma
    transform = gamma - sp.uz * aux.photon_beta_z
    n_rest = photon_n * transform
    p_rest = aux.photon_p * transform
    k = p_rest * INV_MC
    k = jnp.maximum(k, 1e-30)
    f1 = 2 * (2 + k * (1 + k) * (8 + k)) / (k**2 * (1 + 2 * k) ** 2)
    f2 = (2 + k * (2 - k)) * jnp.log1p(2 * k) / k**3
    sigma = PI_RE_2 * (f1 - f2)
    dtau = 0.0 + sp.inv_gamma  # proper time factor; dt applied by caller
    # probability over one timestep dt (dt folded into aux by caller? no:)
    return sigma, n_rest, k


def handle_compton(sp, cfg: ComptonConfig, aux: ComptonAux, dt, time, key):
    """Full Compton step: decide scatterings, emit photons, apply recoil.

    Returns (sp_new, photons dict of fixed-size buffers).
    """
    sigma, n_rest, k = compton_scatter(sp, cfg, aux, time, key)
    proper_dt = dt * sp.inv_gamma
    p_scatter = 1.0 - jnp.exp(-sigma * n_rest * c * proper_dt)

    k1, k2, k3 = jax.random.split(key, 3)
    draw = jax.random.uniform(k1, sp.w.shape, sp.w.dtype)
    scattered = (sp.w != 0) & (draw < p_scatter)

    # Rest-frame emission: Compton-shifted energy at angle theta
    cos_t = jax.random.uniform(k2, sp.w.shape, sp.w.dtype, -1.0, 1.0)
    phi = jax.random.uniform(k3, sp.w.shape, sp.w.dtype, 0.0, 2 * np.pi)
    k_out = k / (1 + k * (1 - cos_t))          # scattered k in rest frame
    p_out = k_out / INV_MC
    sin_t = jnp.sqrt(jnp.maximum(1 - cos_t**2, 0.0))
    px_r = p_out * sin_t * jnp.cos(phi)
    py_r = p_out * sin_t * jnp.sin(phi)
    pz_r = p_out * cos_t * aux.photon_beta_z

    # Boost the photon momentum back to the simulation frame along the
    # electron's direction of motion
    gamma_e = 1.0 / sp.inv_gamma
    u_norm = jnp.sqrt(sp.ux**2 + sp.uy**2 + sp.uz**2)
    inv_u = jnp.where(u_norm > 0, 1.0 / jnp.where(u_norm == 0, 1.0, u_norm),
                      0.0)
    nx, ny, nz = sp.ux * inv_u, sp.uy * inv_u, sp.uz * inv_u
    beta_e = u_norm * sp.inv_gamma
    p_par = nx * px_r + ny * py_r + nz * pz_r
    p_tot_r = p_out
    # Inverse transform (boost with -beta_e)
    p_tot = gamma_e * (p_tot_r + beta_e * p_par)
    p_par_out = gamma_e * (p_par + beta_e * p_tot_r)
    px = px_r + nx * (p_par_out - p_par)
    py = py_r + ny * (p_par_out - p_par)
    pz = pz_r + nz * (p_par_out - p_par)

    # Photon normalized momenta (u = p / (m_e c), photons use
    # inv_gamma = 1/|u| so that push_x moves them at c)
    ux_p = px * INV_MC
    uy_p = py * INV_MC
    uz_p = pz * INV_MC
    u_p = jnp.sqrt(ux_p**2 + uy_p**2 + uz_p**2)
    ig_p = jnp.where(u_p > 0, 1.0 / jnp.where(u_p == 0, 1.0, u_p), 1.0)

    # Electron recoil (in the simulation frame)
    recoil = scattered / jnp.maximum(cfg.ratio_w_electron_photon, 1e-30)
    ux_e = sp.ux - jnp.where(scattered, px * INV_MC, 0.0)
    uy_e = sp.uy - jnp.where(scattered, py * INV_MC, 0.0)
    uz_e = sp.uz - jnp.where(scattered, pz * INV_MC, 0.0)
    ig_e = 1.0 / jnp.sqrt(1 + ux_e**2 + uy_e**2 + uz_e**2)
    import dataclasses
    sp_new = dataclasses.replace(
        sp,
        ux=jnp.where(scattered, ux_e, sp.ux),
        uy=jnp.where(scattered, uy_e, sp.uy),
        uz=jnp.where(scattered, uz_e, sp.uz),
        inv_gamma=jnp.where(scattered, ig_e, sp.inv_gamma),
    )

    # Compact the new photons into a fixed buffer
    B = cfg.buffer_size
    idx = jnp.cumsum(scattered) - 1
    take = scattered & (idx < B)
    slots = jnp.where(take, idx, B)
    new = {}
    vals = dict(x=sp.x, y=sp.y, z=sp.z, ux=ux_p, uy=uy_p, uz=uz_p,
                inv_gamma=ig_p,
                w=sp.w / cfg.ratio_w_electron_photon)
    for name in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w"):
        buf = jnp.zeros(B, sp.x.dtype)
        new[name] = buf.at[slots].set(jnp.where(take, vals[name], 0.0),
                                      mode="drop")
    return sp_new, new
