"""The spectral field solver: state containers + precomputed operator data.

`FieldAux` bundles every precomputed device array the solver needs
(transform matrices, PSATD coefficients, filters, volumes); it is built
once on the host in float64 and cast to the device dtype.  `SpectralFields`
and `InterpFields` are the per-step field state (complex, stacked over
modes as (Nm, Nz, Nr)).

Structural reference: /root/reference/fbpic/fields/fields.py (the Fields
container), re-designed as immutable pytrees for a single jit step.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_dataclass
from ..utils.dtypes import real_dtype
from ..utils.complex_arr import CArr
from .transform import TransformMatrices
from .hankel import build_mode_matrices
from .psatd_coefs import PsatdCoeffs
from .stencil import get_modified_k
from .smoothing import BinomialSmoother
from .grids import cell_volumes, ruyten_coefficients


@static_dataclass
class GridConfig:
    """Static (compile-time) grid configuration for the local domain."""
    Nz: int
    Nr: int
    Nm: int
    dz: float
    dr: float
    rmax: float
    dt: float
    n_order: int = -1
    v_comoving: Optional[float] = None
    use_galilean: bool = True
    use_pml: bool = False
    current_correction: str = "curl-free"
    particle_shape: str = "linear"
    boundaries_z: str = "periodic"  # 'periodic' or 'open'
    # Open-z boundary cell accounting (0 for periodic); the grid's Nz
    # INCLUDES 2*(n_guard + nz_damp + n_inject) extra cells
    # (reference: boundary_communicator.py:224-278)
    n_guard: int = 0
    nz_damp: int = 0
    n_inject: int = 0
    nr_damp: int = 0      # radial PML cells (0 unless use_pml)

    @property
    def use_comoving(self):
        return self.v_comoving is not None

    @property
    def nd_edge(self):
        """Total guard+damp+inject cells at each z edge."""
        return self.n_guard + self.nz_damp + self.n_inject


@pytree_dataclass
class SpectralFields:
    """Spectral-space field state, complex (Nm, Nz, Nr) each."""
    Ep: jax.Array
    Em: jax.Array
    Ez: jax.Array
    Bp: jax.Array
    Bm: jax.Array
    Bz: jax.Array
    Jp: jax.Array
    Jm: jax.Array
    Jz: jax.Array
    rho_prev: jax.Array
    rho_next: jax.Array
    # Cross-deposition extras (None unless current_correction requires them)
    rho_next_z: Optional[jax.Array] = None
    rho_next_xy: Optional[jax.Array] = None
    # Radial-PML split fields (None unless use_pml)
    Ep_pml: Optional[jax.Array] = None
    Em_pml: Optional[jax.Array] = None
    Bp_pml: Optional[jax.Array] = None
    Bm_pml: Optional[jax.Array] = None

    @staticmethod
    def zeros(config: GridConfig, dtype=None) -> "SpectralFields":
        dtype = dtype or real_dtype()
        shape = (config.Nm, config.Nz, config.Nr)
        z = lambda: CArr.zeros(shape, dtype)
        extra = {}
        if config.current_correction == "cross-deposition":
            extra["rho_next_z"] = z()
            extra["rho_next_xy"] = z()
        if config.use_pml:
            extra.update(Ep_pml=z(), Em_pml=z(), Bp_pml=z(), Bm_pml=z())
        return SpectralFields(
            Ep=z(), Em=z(), Ez=z(), Bp=z(), Bm=z(), Bz=z(),
            Jp=z(), Jm=z(), Jz=z(), rho_prev=z(), rho_next=z(), **extra
        )


@pytree_dataclass
class InterpFields:
    """Real-space (interpolation grid) E/B state used by the field gather."""
    Er: jax.Array
    Et: jax.Array
    Ez: jax.Array
    Br: jax.Array
    Bt: jax.Array
    Bz: jax.Array
    Er_pml: Optional[jax.Array] = None
    Et_pml: Optional[jax.Array] = None
    Br_pml: Optional[jax.Array] = None
    Bt_pml: Optional[jax.Array] = None

    @staticmethod
    def zeros(config: GridConfig, dtype=None) -> "InterpFields":
        dtype = dtype or real_dtype()
        shape = (config.Nm, config.Nz, config.Nr)
        z = lambda: CArr.zeros(shape, dtype)
        extra = {}
        if config.use_pml:
            extra.update(Er_pml=z(), Et_pml=z(), Br_pml=z(), Bt_pml=z())
        return InterpFields(Er=z(), Et=z(), Ez=z(), Br=z(), Bt=z(), Bz=z(),
                            **extra)


@pytree_dataclass
class FieldAux:
    """Precomputed device arrays for the spectral solver (built once)."""
    mats: TransformMatrices
    kz_true: jax.Array       # (Nz,) real, FFT-convention kz
    kz: jax.Array            # (1, Nz, 1) modified kz (finite-order stencil)
    kr: jax.Array            # (Nm, 1, Nr)
    # PSATD coefficients, (Nm, Nz, Nr):
    C: jax.Array
    S_w: jax.Array
    j_coef: jax.Array
    rho_prev_coef: jax.Array
    rho_next_coef: jax.Array
    # Galilean/comoving extras (None for the standard scheme):
    T_eb: Optional[jax.Array]
    T_cc: Optional[jax.Array]
    T_rho: Optional[jax.Array]
    j_corr_coef: Optional[jax.Array]
    # Current correction / divE correction:
    inv_k2: jax.Array        # (Nm, Nz, Nr); 0 at k=0
    # Source smoothing filter:
    filter_z: jax.Array      # (Nz,)
    filter_r: jax.Array      # (Nm, Nr)
    # Deposition normalization:
    invvol: jax.Array        # (Nm, Nr) inverse cell volume
    ruyten_linear: jax.Array  # (2, Nr+1): [mode 0, modes > 0]
    ruyten_cubic: jax.Array   # (2, Nr+1)
    # Moving-window spectral shift per cell:
    field_shift: jax.Array   # (Nz,) complex = exp(1j kz_true dz)
    # Open-z damping profile (None for periodic z):
    damp_z: Optional[jax.Array] = None   # (Nz,) multiplicative
    # Radial PML damping profile (None unless use_pml):
    damp_r_pml: Optional[jax.Array] = None  # (Nr,) 1 outside the PML
    # Skinny spectral damping correction (single-chip open z, no
    # mirrors): the z profile differs from 1 only on the guard/damp
    # rows, so damping = spect - Wf[:, rows] (1-prof)[rows] ifft[rows]
    # -- one (Nz, nrows) matmul instead of a full z round trip.
    damp_rows: Optional[jax.Array] = None        # (nrows,) int32
    damp_skinny_re: Optional[jax.Array] = None   # (Nz, nrows)
    damp_skinny_im: Optional[jax.Array] = None


def build_field_aux(config: GridConfig, smoother: BinomialSmoother = None,
                    use_ruyten_shapes=True, use_modified_volume=True
                    ) -> FieldAux:
    """Host-side construction of all solver coefficient arrays."""
    Nz, Nr, Nm = config.Nz, config.Nr, config.Nm
    rdt = real_dtype()

    if smoother is None:
        smoother = BinomialSmoother(n_passes=1, compensator=False)

    mats_np = build_mode_matrices(Nm, Nr, config.rmax)
    kr_np = mats_np["kr"]  # (Nm, Nr)

    kz_true = 2 * np.pi * np.fft.fftfreq(Nz, config.dz)
    kz_mod = get_modified_k(kz_true, config.n_order, config.dz)

    # Full (Nm, Nz, Nr) meshes for the host-side coefficient computation
    kz_mesh = np.broadcast_to(kz_mod[None, :, None], (Nm, Nz, Nr))
    kr_mesh = np.broadcast_to(kr_np[:, None, :], (Nm, Nz, Nr))

    ps = PsatdCoeffs(
        kz_mesh.copy(), kr_mesh.copy(), config.dt,
        V=config.v_comoving, use_galilean=config.use_galilean,
    )

    # inv_k2 with the k=0 entry zeroed (used by curl-free correction)
    k2 = kz_mesh**2 + kr_mesh**2
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))

    filter_z, _ = smoother.get_filter_array(
        kz_true, kr_np[0], config.dz, config.dr
    )
    filter_r = np.stack(
        [smoother.get_filter_array(kz_true, kr_np[m], config.dz,
                                   config.dr)[1] for m in range(Nm)]
    )

    vol_m0, vol_std = cell_volumes(config.dz, Nr, config.rmax,
                                   use_modified_volume=use_modified_volume)
    invvol = np.stack([1.0 / vol_m0] + [1.0 / vol_std] * max(Nm - 1, 0))[:Nm]

    ruyt_lin0, ruyt_cub0 = ruyten_coefficients(
        vol_m0, Nr, config.dr, config.dz, use_ruyten_shapes)
    ruyt_lin1, ruyt_cub1 = ruyten_coefficients(
        vol_std, Nr, config.dr, config.dz, use_ruyten_shapes)

    def dev_r(x):
        return jnp.asarray(x, dtype=rdt)

    def dev(x):
        """Real arrays stay real jnp arrays; complex become CArr."""
        if np.iscomplexobj(x):
            return CArr.from_numpy(x, rdt)
        return jnp.asarray(x, dtype=rdt)

    comoving = config.use_comoving

    from .transform import dft_matrices, dft_factorization_arrays
    Wf, Wi = dft_matrices(Nz)
    split_mats = dft_factorization_arrays(Nz, dev_r)

    # Skinny damping correction: damped = spect - Wf[:, rows] *
    # (1 - prof)[rows] @ partial[rows].  Exact (the profile acts on z
    # only and commutes with the radial transform); the partial rows
    # come from the interp fields the step computes anyway.
    damp_skinny = {}
    if config.boundaries_z == "open" and config.nz_damp > 0:
        prof = _damp_profile_z(config)
        rows = np.nonzero(prof != 1.0)[0]
        if rows.size:
            Wsk = Wf[:, rows] * (1.0 - prof[rows])[None, :]
            damp_skinny = dict(
                damp_rows=jnp.asarray(rows, dtype=jnp.int32),
                damp_skinny_re=dev_r(Wsk.real),
                damp_skinny_im=dev_r(Wsk.imag),
            )

    fwd_mats = ({} if split_mats
                else dict(Wf_re=dev_r(Wf.real), Wf_im=dev_r(Wf.imag)))
    return FieldAux(
        mats=TransformMatrices(
            **{k: dev_r(v) for k, v in mats_np.items() if k != "kr"},
            kr=dev_r(kr_np),
            Wi_re=dev_r(Wi.real), Wi_im=dev_r(Wi.imag),
            **fwd_mats, **split_mats,
        ),
        kz_true=dev_r(kz_true),
        kz=dev_r(kz_mod[None, :, None]),
        kr=dev_r(kr_np[:, None, :]),
        C=dev_r(ps.C),
        S_w=dev_r(ps.S_w),
        # j/rho coefficients are complex in the comoving scheme (CArr),
        # plain real arrays otherwise
        j_coef=dev(ps.j_coef),
        rho_prev_coef=dev(ps.rho_prev_coef),
        rho_next_coef=dev(ps.rho_next_coef),
        T_eb=dev(ps.T_eb) if comoving else None,
        T_cc=dev(ps.T_cc) if comoving else None,
        T_rho=dev(ps.T_rho) if comoving else None,
        j_corr_coef=dev(ps.j_corr_coef) if comoving else None,
        inv_k2=dev_r(inv_k2),
        filter_z=dev_r(filter_z),
        filter_r=dev_r(filter_r),
        invvol=dev_r(invvol),
        ruyten_linear=dev_r(np.stack([ruyt_lin0, ruyt_lin1])),
        ruyten_cubic=dev_r(np.stack([ruyt_cub0, ruyt_cub1])),
        field_shift=CArr.from_numpy(np.exp(1.0j * kz_true * config.dz), rdt),
        damp_z=(dev_r(_damp_profile_z(config))
                if config.boundaries_z == "open" and config.nz_damp > 0
                else None),
        damp_r_pml=(dev_r(_pml_damp_profile_r(config))
                    if config.use_pml and config.nr_damp > 0 else None),
        **damp_skinny,
    )


def _pml_damp_profile_r(config: GridConfig):
    """Radial PML damping: exp(-4 (c dt/dr) x^2) over the last nr_damp
    cells, 1 elsewhere (reference: pml_damping.py:86-110)."""
    from ..constants import c as c_light
    n_pml = config.nr_damp
    x_pml = np.arange(n_pml) / n_pml
    cdt_over_dr = c_light * config.dt / config.dr
    ramp = np.exp(-4.0 * cdt_over_dr * x_pml**2)
    profile = np.ones(config.Nr)
    profile[config.Nr - n_pml:] = ramp
    return profile


def _damp_profile_z(config: GridConfig):
    """Full-grid multiplicative damping profile for open z boundaries.

    sin^2 ramp over nz_damp cells, zero over the guard+injection cells,
    at both ends (reference: boundary_communicator.py:909-945).
    """
    n_guard, nz_damp, n_inject = (config.n_guard, config.nz_damp,
                                  config.n_inject)
    nd = config.nd_edge
    i_cell = np.arange(nd)
    ramp = np.where(
        i_cell < n_guard + n_inject + nz_damp / 2.0,
        np.sin((i_cell - (n_guard + n_inject)) * np.pi / nz_damp) ** 2,
        1.0,
    )
    ramp = np.where(i_cell < n_guard + n_inject, 0.0, ramp)
    profile = np.ones(config.Nz)
    profile[:nd] = ramp
    profile[config.Nz - nd:] = ramp[::-1]
    return profile
