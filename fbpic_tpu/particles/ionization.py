"""ADK field ionization (relativistic, boosted-frame compatible).

TPU-native design: ionization runs entirely inside the jit step.  Each
ion macroparticle carries an `ionization_level`; the ADK probability is
evaluated in the ion rest frame (Lorentz invariant), a per-step PRNG
draw decides ionization, and the newly-freed electrons are compacted
into a fixed-capacity buffer and written into the target species' ring
buffer -- no reallocation (reference:
/root/reference/fbpic/particles/elementary_process/ionization/).

Rate formula: ADK as in Chen et al., JCP 236 (2013), eq. (2).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_dataclass
from ..utils.dtypes import real_dtype
from ..constants import c, e, m_e

# Ionization energies in eV (NIST Atomic Spectra Database values).
# One list per element: energy to go from charge state i to i+1.
IONIZATION_ENERGIES_EV = {
    "H": [13.598434],
    "He": [24.587387, 54.417763],
    "Li": [5.391715, 75.64009, 122.45429],
    "C": [11.260296, 24.38332, 47.88778, 64.49352, 392.090515, 489.993194],
    "N": [14.53413, 29.60125, 47.4453, 77.4735, 97.8901,
          552.06733, 667.04609],
    "O": [13.618055, 35.12112, 54.93554, 77.41350, 113.8990, 138.1189,
          739.32683, 871.40988],
    "Ne": [21.564540, 40.96297, 63.4233, 97.1900, 126.247, 157.934,
           207.271, 239.0970, 1195.80784, 1362.19916],
    "Al": [5.985769, 18.82855, 28.447642, 119.9924, 153.8252, 190.49,
           241.76, 284.64, 330.21, 398.65, 442.005, 2085.97702,
           2304.14007],
    "Ar": [15.7596119, 27.62967, 40.735, 59.58, 74.84, 91.290, 124.41,
           143.4567, 422.60, 479.76, 540.4, 619.0, 686.9, 755.13, 855.5,
           918.375, 4120.6657, 4426.2229],
    "Kr": [13.9996055, 24.35984, 35.838, 50.85, 64.69, 78.49, 109.13,
           125.802],
    "Xe": [12.1298437, 20.975, 31.05, 42.20, 54.1, 66.703, 91.6, 105.978],
}

# Physical constants for the ADK prefactors
ALPHA_FS = 7.2973525693e-3        # fine-structure constant
R_E = 2.8179403262e-15            # classical electron radius [m]
UH_EV = 13.598434                 # hydrogen ionization energy [eV]


def get_ionization_energies(element):
    """Ionization energies in Joules, or None for unknown elements."""
    if element not in IONIZATION_ENERGIES_EV:
        return None
    return np.array(IONIZATION_ENERGIES_EV[element]) * e


@static_dataclass
class IonizerConfig:
    """Static ionization settings of one species."""
    element: str
    level_start: int
    level_max: int
    target_index: int          # species index receiving the electrons
    buffer_size: int = 8192    # max electrons created per step


@pytree_dataclass
class IonizerAux:
    """Device ADK coefficient arrays, one element per ionization level."""
    adk_prefactor: jax.Array
    adk_power: jax.Array
    adk_exp_prefactor: jax.Array


def build_ionizer_aux(element, dt, level_max=None):
    """Compute the ADK prefactor arrays (host float64).

    Math: Chen JCP 2013 eq. (2); reference ionizer.py:157-208.
    """
    from scipy.special import gamma as gamma_fn
    Uion = get_ionization_energies(element)
    if Uion is None:
        raise ValueError(
            "Unknown ionizable element %s. Use the atomic symbol "
            "(e.g. 'He', not 'Helium')." % element)
    if level_max is not None:
        if level_max > len(Uion):
            raise ValueError(
                "level_max for %s cannot exceed %d" % (element, len(Uion)))

    wa = ALPHA_FS**3 * c / R_E
    Ea = m_e * c**2 / e * ALPHA_FS**4 / R_E
    UH = UH_EV * e
    Z = np.arange(len(Uion)) + 1
    n_eff = Z * np.sqrt(UH / Uion)
    l_eff = n_eff[0] - 1
    C2 = 2 ** (2 * n_eff) / (
        n_eff * gamma_fn(n_eff + l_eff + 1) * gamma_fn(n_eff - l_eff))
    adk_power = -(2 * n_eff - 1)
    adk_prefactor = dt * wa * C2 * (Uion / (2 * UH)) \
        * (2 * (Uion / UH) ** 1.5 * Ea) ** (2 * n_eff - 1)
    adk_exp_prefactor = -2.0 / 3 * (Uion / UH) ** 1.5 * Ea

    rdt = real_dtype()
    return IonizerAux(
        adk_prefactor=jnp.asarray(adk_prefactor, rdt),
        adk_power=jnp.asarray(adk_power, rdt),
        adk_exp_prefactor=jnp.asarray(adk_exp_prefactor, rdt),
    ), len(Uion)


def ionize(sp, E, B, ion_cfg: IonizerConfig, ion_aux: IonizerAux, key):
    """One ionization step for one species.

    Parameters
    ----------
    sp: ParticleState with ionization_level
    E, B: per-particle (Ex,Ey,Ez), (Bx,By,Bz) gathered fields
    key: PRNG key for the ionization draw

    Returns (sp_updated, new_electrons dict) -- the dict has fixed-size
    arrays (buffer_size,) with w = 0 marking empty slots.
    """
    ux, uy, uz = sp.ux, sp.uy, sp.uz
    Ex, Ey, Ez = E
    cBx, cBy, cBz = c * B[0], c * B[1], c * B[2]

    # E-field amplitude in the ion rest frame (Lorentz invariant rate)
    u_dot_E = ux * Ex + uy * Ey + uz * Ez
    gamma = jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
    E2 = (
        -(u_dot_E) ** 2
        + (gamma * Ex + uy * cBz - uz * cBy) ** 2
        + (gamma * Ey + uz * cBx - ux * cBz) ** 2
        + (gamma * Ez + ux * cBy - uy * cBx) ** 2
    )
    E_amp = jnp.sqrt(jnp.maximum(E2, 0.0))

    level = sp.ionization_level
    lvl_idx = jnp.clip(level, 0, ion_aux.adk_prefactor.shape[0] - 1)
    prefactor = ion_aux.adk_prefactor[lvl_idx]
    power = ion_aux.adk_power[lvl_idx]
    exp_prefactor = ion_aux.adk_exp_prefactor[lvl_idx]

    safe_E = jnp.where(E_amp > 0, E_amp, 1.0)
    w_dtau = (1.0 / gamma) * prefactor * safe_E**power \
        * jnp.exp(exp_prefactor / safe_E)
    p = jnp.where(E_amp > 0, 1.0 - jnp.exp(-w_dtau), 0.0)

    draw = jax.random.uniform(key, sp.w.shape, sp.w.dtype)
    can_ionize = (sp.w != 0) & (level < ion_cfg.level_max)
    ionized = can_ionize & (draw < p)

    sp_new = sp.__class__(**{
        **{f: getattr(sp, f) for f in sp.__dataclass_fields__},
        "ionization_level": jnp.where(ionized, level + 1, level),
    })

    # Compact the new electrons into a fixed-size buffer
    B_size = ion_cfg.buffer_size
    idx = jnp.cumsum(ionized) - 1
    take = ionized & (idx < B_size)
    slots = jnp.where(take, idx, B_size)

    new = {}
    for name in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w"):
        arr = getattr(sp, name)
        buf = jnp.zeros(B_size, arr.dtype)
        new[name] = buf.at[slots].set(jnp.where(take, arr, 0.0),
                                      mode="drop")
    # Electrons inherit the ion momentum (recoil neglected, as in the
    # reference); weight is the plain macroparticle weight
    return sp_new, new
