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
import os
import re

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_dataclass
from ..utils.dtypes import real_dtype
from ..constants import c, e, m_e
from .compaction import topk_compact

# Full NIST ionization-energy table (public-domain NIST ASD data; the
# file carries the NIST license/citation header).  Covers H-Ar, Kr, Xe,
# Rb, Rn with every ionization level (reference parses the same table:
# read_atomic_data.py:14-107).
_ATOMIC_DATA_FILE = os.path.join(os.path.dirname(__file__),
                                 "atomic_data.txt")
_cached_energies = {}

# Physical constants for the ADK prefactors
ALPHA_FS = 7.2973525693e-3        # fine-structure constant
R_E = 2.8179403262e-15            # classical electron radius [m]
UH_EV = 13.598434                 # hydrogen ionization energy [eV]


def get_ionization_energies(element):
    """Ionization energies in Joules (one entry per ionization level,
    i.e. energy to go from charge state i to i+1), or None for elements
    absent from the table."""
    if element in _cached_energies:
        return _cached_energies[element]
    levels = {}
    atomic_number = None
    with open(_ATOMIC_DATA_FILE) as f:
        for line in f:
            if "|" not in line or line.lstrip().startswith("#"):
                continue
            parts = [p.strip() for p in line.split("|")]
            if len(parts) < 4 or not parts[0].isdigit():
                continue
            sym = parts[1].split()[0] if parts[1] else ""
            if sym != element:
                continue
            charge = int(parts[2].lstrip("+") or 0)
            match = re.search(r"(\d+\.?\d*)", parts[3])
            if match is None:
                continue
            levels[charge] = float(match.group(1))
            atomic_number = int(parts[0])
    if not levels:
        _cached_energies[element] = None
        return None
    energies = np.zeros(atomic_number)
    for lvl in range(atomic_number):
        assert lvl in levels, (
            f"atomic_data.txt is missing level {lvl} of {element}")
        energies[lvl] = e * levels[lvl]
    _cached_energies[element] = energies
    return energies


@static_dataclass
class IonizerConfig:
    """Static ionization settings of one species."""
    element: str
    level_start: int
    level_max: int
    target_index: int          # species index receiving the electrons
    buffer_size: int = 8192    # max electrons created per step
    # Optional per-level electron routing (reference ionizer.py:123-146:
    # a dict {level: species}): tuple of species indices, one per
    # ionizable level from level_start to level_max-1.  Empty tuple =
    # all electrons go to target_index.
    per_level_targets: tuple = ()


@pytree_dataclass
class IonizerAux:
    """Device ADK coefficient arrays, one element per ionization level.

    The rate is evaluated in log space: the plain prefactor
    dt*wa*C2*(U/2UH)*(2(U/UH)^1.5 Ea)^(2n-1) spans ~1e-30..1e+60 across
    high ionization levels, which overflows float32 on TPU; the log
    form stays O(100).
    """
    adk_log_prefactor: jax.Array
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
    adk_log_prefactor = (
        np.log(dt * wa * C2 * (Uion / (2 * UH)))
        + (2 * n_eff - 1) * np.log(2 * (Uion / UH) ** 1.5 * Ea))
    adk_exp_prefactor = -2.0 / 3 * (Uion / UH) ** 1.5 * Ea

    rdt = real_dtype()
    return IonizerAux(
        adk_log_prefactor=jnp.asarray(adk_log_prefactor, rdt),
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
    lvl_idx = jnp.clip(level, 0, ion_aux.adk_log_prefactor.shape[0] - 1)
    log_prefactor = ion_aux.adk_log_prefactor[lvl_idx]
    power = ion_aux.adk_power[lvl_idx]
    exp_prefactor = ion_aux.adk_exp_prefactor[lvl_idx]

    # Log-space evaluation (f32-safe; see IonizerAux docstring)
    safe_E = jnp.where(E_amp > 0, E_amp, 1.0)
    log_w_dtau = (log_prefactor + power * jnp.log(safe_E)
                  + exp_prefactor / safe_E - jnp.log(gamma))
    w_dtau = jnp.exp(jnp.minimum(log_w_dtau, 60.0))
    p = jnp.where(E_amp > 0, 1.0 - jnp.exp(-w_dtau), 0.0)

    draw = jax.random.uniform(key, sp.w.shape, sp.w.dtype)
    can_ionize = (sp.w != 0) & (level < ion_cfg.level_max)
    ionized = can_ionize & (draw < p)

    sp_new = sp.__class__(**{
        **{f: getattr(sp, f) for f in sp.__dataclass_fields__},
        "ionization_level": jnp.where(ionized, level + 1, level),
    })

    # Compact the new electrons into a fixed-size buffer (top_k + small
    # gathers, not per-channel scatters -- 9 scatters of the padded
    # layout's N~1.3e6 cost ~48 ms/step on TPU; see compaction.py).
    # 'level' is the ion's level BEFORE this ionization: used to route
    # electrons to per-level target species.
    arrays = {name: getattr(sp, name)
              for name in ("x", "y", "z", "ux", "uy", "uz",
                           "inv_gamma", "w")}
    arrays["level"] = level.astype(jnp.int32)
    new, _, _ = topk_compact(ionized, ion_cfg.buffer_size, arrays)
    # Electrons inherit the ion momentum (recoil neglected, as in the
    # reference); weight is the plain macroparticle weight
    return sp_new, new


def select_level_electrons(new, level):
    """Repack the electrons of one birth level to the buffer front.

    Returns a dict like `new` (without 'level') where only electrons
    with new['level'] == level survive, compacted with w = 0 padding.
    """
    B_size = new["w"].shape[0]
    mask = (new["w"] != 0) & (new["level"] == level)
    idx = jnp.cumsum(mask) - 1
    slots = jnp.where(mask, idx, B_size)
    out = {}
    for name in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w"):
        buf = jnp.zeros(B_size, new[name].dtype)
        out[name] = buf.at[slots].set(jnp.where(mask, new[name], 0.0),
                                      mode="drop")
    return out
