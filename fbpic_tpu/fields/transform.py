"""Interpolation-grid <-> spectral-grid transforms, batched over modes.

All fields are stored stacked over azimuthal modes as split-complex
CArr of shape (Nm, Nz, Nr).  Both transforms are dense real matmuls on
the MXU:

  - radial: the quasi-DHT, a per-mode (Nr, Nr) matrix (reference:
    spectral_transform/hankel.py) -- dense by construction;
  - longitudinal: the DFT as an (Nz, Nz) matrix.  The TPU backend has
    no complex FFT, and at PIC sizes (Nz ~ 1e3) a dense DFT saturates
    the MXU and fuses with the neighbouring real/imag combinations.

Transform composition (reference: spectral_transformer.py:89-223):
  scalar  interp->spect : DFT(z) then  G = F @ M0
  scalar  spect->interp : F = G @ invM0  then IDFT(z)
  vector  interp->spect : DFT both, (r,t)->(p,m), p @ Mp, m @ Mm
  vector  spect->interp : p @ invMp, m @ invMm, (p,m)->(r,t), IDFT both
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..utils.dtypes import real_dtype
from ..utils.complex_arr import CArr
from .hankel import build_mode_matrices

# Spectral transforms need true-f32 matmuls: the TPU MXU's default
# bf16 multiplies (~4e-3 relative) inject mode-0 noise that the 1/k^2
# current correction amplifies into O(1e7 V/m) spurious fields
# (measured on v5e; see tests/test_linear_wakefield.py).  'highest' is
# f32-exact on TPU (6-pass); set FBPIC_TPU_MATMUL_PRECISION=high to
# trade ~1e-6 relative accuracy for ~2x faster transforms.
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("FBPIC_TPU_MATMUL_PRECISION", "highest").lower()]

# The E/B field transforms run at HIGH (3-pass, ~1e-6 relative) by
# default: the 1/k^2 mode-0 amplification above is specific to the
# SOURCE pipeline (rho/J feed the current correction's inv_k2), while
# ~1e-6 noise on the gathered E/B is ~3 orders below the measured f32
# summation-order floor of a production run (VERDICT r4: any
# reordering moves a 450-step wake by 3-6%; the 100-step golden-wake
# pin sits 10x above its reordering floor and gates this).  Set
# FBPIC_TPU_MATMUL_PRECISION_EB=highest to restore 6-pass everywhere.
_PRECISION_EB = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("FBPIC_TPU_MATMUL_PRECISION_EB", "high").lower()]


def dft_matrices(Nz):
    """Dense DFT matrices (numpy convention: forward unnormalized).

    Returns (Wf, Wi): complex128 (Nz, Nz) with
      forward:  X[k] = sum_n Wf[k, n] x[n],  Wf = exp(-2i pi k n / Nz)
      inverse:  x[n] = sum_k Wi[n, k] X[k],  Wi = conj(Wf) / Nz
    """
    k = np.arange(Nz)
    Wf = np.exp(-2j * np.pi * np.outer(k, k) / Nz)
    Wi = np.conj(Wf) / Nz
    return Wf, Wi


def _pick_radix(Nz):
    """Largest radix in {8, 7, 6, 5, 4, 3, 2} that divides Nz with a
    sub-transform size of at least 64 (keeps the MXU tiles filled)."""
    for R in (8, 7, 6, 5, 4, 3, 2):
        if Nz % R == 0 and Nz // R >= 64:
            return R
    return 1


def _pick_balanced_factors(Nz, min_factor=64):
    """Balanced factorization Nz = N1 * N2 with both factors >=
    min_factor and as close to sqrt(Nz) as possible (N1 >= N2).
    Returns None when Nz has no such factorization."""
    best = None
    for N2 in range(int(np.sqrt(Nz)), min_factor - 1, -1):
        if Nz % N2 == 0:
            N1 = Nz // N2
            best = (N1, N2)
            break
    return best


def fourstep_dft_matrices(Nz, min_factor=64):
    """Bailey four-step factorization of the length-Nz DFT.

    With Nz = N1 * N2, n = n1 + N1 n2, k = k2 + N2 k1:

        X[k2 + N2 k1] = sum_{n1} W1[k1, n1] * tw[n1, k2]
                        * sum_{n2} W2[k2, n2] x[n1 + N1 n2]

    i.e. two dense batched matmul stages -- (N2, N2) then (N1, N1) --
    plus an elementwise twiddle in between: O(Nz (N1 + N2)) MXU flops
    instead of O(Nz^2), a ~sqrt(Nz)/2-fold saving that (unlike the
    one-level decimation split, which tiles the sub-spectra R-fold)
    needs no intermediate larger than the field itself.  This is the
    large-Nz (boosted-frame production box) path; the reference uses
    cuFFT/MKL (/root/reference/fbpic/fields/spectral_transform/
    fourier.py:27-101) for the same reason.

    Returns None when no balanced factorization with both factors >=
    min_factor exists (e.g. prime Nz), else a dict of the forward and
    (1/Nz-normalized) inverse stage matrices and twiddles.
    """
    fac = _pick_balanced_factors(Nz, min_factor)
    if fac is None:
        return None
    N1, N2 = fac
    a1 = np.arange(N1)
    a2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(a1, a1) / N1)     # (k1, n1)
    W2 = np.exp(-2j * np.pi * np.outer(a2, a2) / N2)     # (k2, n2)
    tw = np.exp(-2j * np.pi * np.outer(a1, a2) / Nz)     # (n1, k2)
    return dict(
        N1=N1, N2=N2,
        W1f=W1, W2f=W2, twf=tw,
        W1i=np.conj(W1), W2i=np.conj(W2), twi=np.conj(tw) / Nz,
    )


def split_dft_matrices(Nz):
    """One-level Cooley-Tukey factorization of the length-Nz DFT.

    Decimation in time over R strided subsequences:
        X[k] = sum_r exp(-2i pi k r / Nz) * (DFT_M x[r::R])[k mod M]
    with M = Nz/R.  This turns the dense (Nz, Nz) matmul (2 Nz^2 flops
    per column) into R batched (M, M) matmuls (2 Nz^2 / R flops) plus a
    cheap elementwise twiddle-combine -- an R-fold MXU flop saving,
    which matters because the spectral transforms must run at
    float32-exact (6-pass) precision.

    Returns None when no useful factorization exists, else a dict with
    the (M, M) sub-DFT matrices and (Nz, R) twiddles for the forward
    and (1/Nz-normalized) inverse transforms.
    """
    R = _pick_radix(Nz)
    if R == 1:
        return None
    M = Nz // R
    m = np.arange(M)
    WfM = np.exp(-2j * np.pi * np.outer(m, m) / M)       # (u, m)
    k = np.arange(Nz)
    r = np.arange(R)
    twf = np.exp(-2j * np.pi * np.outer(k, r) / Nz)      # (k, r)
    WiM = np.conj(WfM)
    twi = np.conj(twf) / Nz
    return dict(R=R, M=M, WfM=WfM, twf=twf, WiM=WiM, twi=twi)


@pytree_dataclass
class TransformMatrices:
    """Device-resident transform matrices.

    DHT matrices are stacked over modes: (Nm, Nr, Nr); DFT matrices are
    shared across modes: (Nz, Nz), stored as split re/im.
    """
    M0: jax.Array
    invM0: jax.Array
    Mp: jax.Array
    invMp: jax.Array
    Mm: jax.Array
    invMm: jax.Array
    kr: jax.Array      # (Nm, Nr)
    # Dense DFT matrices; the forward pair is omitted (None) when a
    # factorization below is active, the inverse is kept for the
    # boosted-frame diagnostic's row reads (boosted_diag.py)
    Wf_re: jax.Array = None   # (Nz, Nz) forward DFT
    Wf_im: jax.Array = None
    Wi_re: jax.Array = None   # (Nz, Nz) inverse DFT
    Wi_im: jax.Array = None
    # Optional Cooley-Tukey factorization (None = dense DFT):
    # (M, M) sub-DFT matrices + (Nz, R) twiddles, see split_dft_matrices
    WfM_re: jax.Array = None
    WfM_im: jax.Array = None
    twf_re: jax.Array = None
    twf_im: jax.Array = None
    WiM_re: jax.Array = None
    WiM_im: jax.Array = None
    twi_re: jax.Array = None
    twi_im: jax.Array = None
    # Optional four-step (Bailey) factorization, preferred at large Nz
    # (boosted-frame boxes): (N1, N1) + (N2, N2) stage matrices and
    # (N1, N2) twiddles, see fourstep_dft_matrices
    W1f_re: jax.Array = None
    W1f_im: jax.Array = None
    W2f_re: jax.Array = None
    W2f_im: jax.Array = None
    tw4f_re: jax.Array = None
    tw4f_im: jax.Array = None
    W1i_re: jax.Array = None
    W1i_im: jax.Array = None
    W2i_re: jax.Array = None
    W2i_im: jax.Array = None
    tw4i_re: jax.Array = None
    tw4i_im: jax.Array = None

    @staticmethod
    def build(Nm: int, Nr: int, Nz: int, rmax: float,
              dtype=None) -> "TransformMatrices":
        mats = build_mode_matrices(Nm, Nr, rmax)
        Wf, Wi = dft_matrices(Nz)
        dtype = dtype or real_dtype()
        dev = lambda v: jnp.asarray(v, dtype=dtype)
        extra = dft_factorization_arrays(Nz, dev)
        # The dense forward matrix is dead weight when a factorization
        # is active (the inverse stays: boosted_diag reads its rows)
        fwd = {} if extra else dict(Wf_re=dev(Wf.real),
                                    Wf_im=dev(Wf.imag))
        return TransformMatrices(
            M0=dev(mats["M0"]), invM0=dev(mats["invM0"]),
            Mp=dev(mats["Mp"]), invMp=dev(mats["invMp"]),
            Mm=dev(mats["Mm"]), invMm=dev(mats["invMm"]),
            kr=dev(mats["kr"]),
            Wi_re=dev(Wi.real), Wi_im=dev(Wi.imag),
            **fwd, **extra,
        )


#: Nz at or above which the four-step factorization is preferred over
#: the one-level radix split.  Both stage factors must also be >= 64
#: to keep the MXU tiles usefully filled, so in practice the four-step
#: engages at Nz >= 4096 (boosted-frame boxes) and the radix split
#: covers the mid sizes.
FOURSTEP_MIN_NZ = int(os.environ.get("FBPIC_TPU_FOURSTEP_MIN_NZ", "1024"))


def dft_factorization_arrays(Nz, dev):
    """The optional-factorization fields of TransformMatrices.

    Policy: four-step (O(Nz^1.5) flops, no tiling blowup) whenever
    Nz >= FOURSTEP_MIN_NZ and a balanced factorization with both
    factors >= 64 exists; else the one-level radix split (R-fold flop
    cut); else nothing (dense DFT).  `dev` converts numpy -> device
    array at the working dtype.
    """
    if Nz >= FOURSTEP_MIN_NZ:
        # Prefer both factors >= 64 (full MXU tiles); when Nz has no
        # such factorization (e.g. 4500 = 75 x 60) accept a smaller
        # factor down to 32 -- the ~sqrt(Nz)-fold flop cut dwarfs the
        # half-filled tile of one stage
        fs = fourstep_dft_matrices(Nz)
        if fs is None and Nz >= 4 * FOURSTEP_MIN_NZ:
            fs = fourstep_dft_matrices(Nz, min_factor=32)
        if fs is not None:
            return dict(
                W1f_re=dev(fs["W1f"].real), W1f_im=dev(fs["W1f"].imag),
                W2f_re=dev(fs["W2f"].real), W2f_im=dev(fs["W2f"].imag),
                tw4f_re=dev(fs["twf"].real), tw4f_im=dev(fs["twf"].imag),
                W1i_re=dev(fs["W1i"].real), W1i_im=dev(fs["W1i"].imag),
                W2i_re=dev(fs["W2i"].real), W2i_im=dev(fs["W2i"].imag),
                tw4i_re=dev(fs["twi"].real), tw4i_im=dev(fs["twi"].imag),
            )
    split = split_dft_matrices(Nz)
    if split is not None:
        return dict(
            WfM_re=dev(split["WfM"].real), WfM_im=dev(split["WfM"].imag),
            twf_re=dev(split["twf"].real), twf_im=dev(split["twf"].imag),
            WiM_re=dev(split["WiM"].real), WiM_im=dev(split["WiM"].imag),
            twi_re=dev(split["twi"].real), twi_im=dev(split["twi"].imag),
        )
    return {}


def dht(M: jax.Array, F: CArr, precision=None) -> CArr:
    """Batched radial transform: out[m, z, s] = sum_r F[m, z, r] M[m, r, s].

    M is real (Nm, Nr, Nr) so the complex transform is two real GEMMs.
    """
    pe = M.dtype
    prec = precision or _PRECISION
    return CArr(
        jnp.einsum("mzr,mrs->mzs", F.re, M, preferred_element_type=pe,
                   precision=prec),
        jnp.einsum("mzr,mrs->mzs", F.im, M, preferred_element_type=pe,
                   precision=prec),
    )


def _zmatmul(Wre, Wim, F: CArr) -> CArr:
    """Apply a complex (Nz, Nz) matrix along the z axis of F (Nm, Nz, Nr)."""
    pe = Wre.dtype
    ein = lambda W, X: jnp.einsum("uz,mzr->mur", W, X,
                                  preferred_element_type=pe,
                   precision=_PRECISION)
    return CArr(
        ein(Wre, F.re) - ein(Wim, F.im),
        ein(Wre, F.im) + ein(Wim, F.re),
    )


def _zmatmul_split_many(WM_re, WM_im, tw_re, tw_im, fields,
                        precision=None):
    """One-level Cooley-Tukey z-transform of a list of CArr.

    X[k] = sum_r tw[k, r] * (DFT_M x[r::R])[k mod M]: R batched (M, M)
    matmuls (Nz^2/R MXU flops instead of Nz^2) + an elementwise
    twiddle-combine on the VPU.
    """
    Nm, Nz, Nr = fields[0].shape
    M = WM_re.shape[0]
    R = Nz // M
    pe = WM_re.dtype
    Q = jnp.concatenate([x for F in fields for x in (F.re, F.im)], axis=-1)
    q = Q.shape[-1]
    # Strided subsequences x[r::R]: (Nm, Nz, q) -> (Nm, R, M, q)
    Qr = Q.reshape(Nm, M, R, q).transpose(0, 2, 1, 3)
    prec = precision or _PRECISION
    A = jnp.einsum("um,nrmq->nruq", WM_re, Qr, preferred_element_type=pe,
                   precision=prec)
    B = jnp.einsum("um,nrmq->nruq", WM_im, Qr, preferred_element_type=pe,
                   precision=prec)
    # Tile the length-M sub-spectra along k and combine with twiddles
    At = jnp.tile(A, (1, 1, R, 1))                   # (Nm, R, Nz, q)
    Bt = jnp.tile(B, (1, 1, R, 1))
    Tr = tw_re.T[None, :, :, None]                   # (1, R, Nz, 1)
    Ti = tw_im.T[None, :, :, None]
    out = []
    for i in range(len(fields)):
        re_sl = slice((2 * i) * Nr, (2 * i + 1) * Nr)
        im_sl = slice((2 * i + 1) * Nr, (2 * i + 2) * Nr)
        Yre = At[..., re_sl] - Bt[..., im_sl]
        Yim = At[..., im_sl] + Bt[..., re_sl]
        out.append(CArr(jnp.sum(Tr * Yre - Ti * Yim, axis=1),
                        jnp.sum(Tr * Yim + Ti * Yre, axis=1)))
    return out


def _combine_packed(A, B, Nr):
    """Complex combine of packed-channel real matmul outputs.

    The trailing axis of A = W_re @ Q and B = W_im @ Q holds
    [f0.re, f0.im, f1.re, f1.im, ...] blocks of width Nr; returns the
    same packing of (W_re + i W_im)(re + i im)."""
    sh = A.shape[:-1]
    A5 = A.reshape(*sh, -1, 2, Nr)
    B5 = B.reshape(*sh, -1, 2, Nr)
    Yre = A5[..., 0, :] - B5[..., 1, :]
    Yim = A5[..., 1, :] + B5[..., 0, :]
    return jnp.stack([Yre, Yim], axis=-2).reshape(*sh, A.shape[-1])


def _twiddle_packed(Y, twre, twim, Nr):
    """Elementwise complex multiply of packed (Nm, N1, N2, q) channels
    by the (N1, N2) twiddle factors."""
    sh = Y.shape
    Y5 = Y.reshape(*sh[:-1], -1, 2, Nr)
    yre, yim = Y5[..., 0, :], Y5[..., 1, :]
    tre = twre[None, :, :, None, None]
    tim = twim[None, :, :, None, None]
    out = jnp.stack([tre * yre - tim * yim, tre * yim + tim * yre],
                    axis=-2)
    return out.reshape(sh)


def _zmatmul_fourstep_many(mats: TransformMatrices, fields, forward,
                           precision=None):
    """Four-step (Bailey) z-transform of a list of CArr (Nm, Nz, Nr).

    Two dense batched matmul stages with an elementwise twiddle in
    between (see fourstep_dft_matrices); every intermediate has the
    size of the stacked fields themselves.
    """
    Nm, Nz, Nr = fields[0].shape
    if forward:
        W1re, W1im = mats.W1f_re, mats.W1f_im
        W2re, W2im = mats.W2f_re, mats.W2f_im
        twre, twim = mats.tw4f_re, mats.tw4f_im
    else:
        W1re, W1im = mats.W1i_re, mats.W1i_im
        W2re, W2im = mats.W2i_re, mats.W2i_im
        twre, twim = mats.tw4i_re, mats.tw4i_im
    N1, N2 = W1re.shape[0], W2re.shape[0]
    pe = W1re.dtype
    Q = jnp.concatenate([x for F in fields for x in (F.re, F.im)], axis=-1)
    q = Q.shape[-1]
    prec = precision or _PRECISION
    ein = lambda spec, W, X: jnp.einsum(spec, W, X,
                                        preferred_element_type=pe,
                                        precision=prec)
    if forward:
        # x indexed n = n1 + N1 n2 -> axes (n2, n1); out k = k2 + N2 k1
        X4 = Q.reshape(Nm, N2, N1, q)
        Y = _combine_packed(ein("kv,mvnq->mnkq", W2re, X4),
                            ein("kv,mvnq->mnkq", W2im, X4), Nr)
        T = _twiddle_packed(Y, twre, twim, Nr)          # (Nm, n1, k2, q)
        Z = _combine_packed(ein("un,mnkq->mukq", W1re, T),
                            ein("un,mnkq->mukq", W1im, T), Nr)
    else:
        # X indexed k = k2 + N2 k1 -> axes (k1, k2); out n = n1 + N1 n2
        X4 = Q.reshape(Nm, N1, N2, q)
        P = _combine_packed(ein("nu,mukq->mnkq", W1re, X4),
                            ein("nu,mukq->mnkq", W1im, X4), Nr)
        T = _twiddle_packed(P, twre, twim, Nr)          # (Nm, n1, k2, q)
        Z = _combine_packed(ein("vk,mnkq->mvnq", W2re, T),
                            ein("vk,mnkq->mvnq", W2im, T), Nr)
    Z = Z.reshape(Nm, Nz, q)
    out = []
    for i in range(len(fields)):
        re_sl = slice((2 * i) * Nr, (2 * i + 1) * Nr)
        im_sl = slice((2 * i + 1) * Nr, (2 * i + 2) * Nr)
        out.append(CArr(Z[..., re_sl], Z[..., im_sl]))
    return out


def fft_z(mats: TransformMatrices, F: CArr) -> CArr:
    """Forward DFT along z (axis -2), unnormalized (numpy convention)."""
    if mats.W1f_re is not None:
        return _zmatmul_fourstep_many(mats, [F], forward=True)[0]
    if mats.WfM_re is not None:
        return _zmatmul_split_many(mats.WfM_re, mats.WfM_im,
                                   mats.twf_re, mats.twf_im, [F])[0]
    return _zmatmul(mats.Wf_re, mats.Wf_im, F)


def ifft_z(mats: TransformMatrices, F: CArr) -> CArr:
    """Inverse DFT along z (axis -2), 1/Nz normalized."""
    if mats.W1i_re is not None:
        return _zmatmul_fourstep_many(mats, [F], forward=False)[0]
    if mats.WiM_re is not None:
        return _zmatmul_split_many(mats.WiM_re, mats.WiM_im,
                                   mats.twi_re, mats.twi_im, [F])[0]
    return _zmatmul(mats.Wi_re, mats.Wi_im, F)


def rt_to_pm(Fr: CArr, Ft: CArr):
    """(r, t) -> (+, -) spectral combination."""
    Fp = 0.5 * (Fr - Ft.mul_i())
    Fm = 0.5 * (Fr + Ft.mul_i())
    return Fp, Fm


def pm_to_rt(Fp: CArr, Fm: CArr):
    """(+, -) -> (r, t) combination."""
    Fr = Fp + Fm
    Ft = (Fp - Fm).mul_i()
    return Fr, Ft


def interp2spect_scal(mats: TransformMatrices, F: CArr) -> CArr:
    return dht(mats.M0, fft_z(mats, F))


def spect2interp_scal(mats: TransformMatrices, G: CArr) -> CArr:
    return ifft_z(mats, dht(mats.invM0, G))


def interp2spect_vect(mats: TransformMatrices, Fr: CArr, Ft: CArr):
    fr = fft_z(mats, Fr)
    ft = fft_z(mats, Ft)
    p, m = rt_to_pm(fr, ft)
    return dht(mats.Mp, p), dht(mats.Mm, m)


def spect2interp_vect(mats: TransformMatrices, Gp: CArr, Gm: CArr):
    p = dht(mats.invMp, Gp)
    m = dht(mats.invMm, Gm)
    Fr, Ft = pm_to_rt(p, m)
    return ifft_z(mats, Fr), ifft_z(mats, Ft)


# Partial transforms (z only), used around guard-cell exchange in the
# multi-domain case (reference: fields.py:431-536)
def spect2partial_interp(mats: TransformMatrices, G: CArr) -> CArr:
    return ifft_z(mats, G)


def partial_interp2spect(mats: TransformMatrices, F: CArr) -> CArr:
    return fft_z(mats, F)


# ---------------------------------------------------------------------
# Fused multi-field transforms
#
# The MXU wants wide GEMMs: a single field's DFT is (Nz, Nz) @ (Nz, Nr)
# with Nr ~ 50 -- badly under-filled lanes.  Stacking every field
# component (and re/im) along the trailing axis turns the whole
# transform stage into one well-tiled matmul.
# ---------------------------------------------------------------------

def _zmatmul_many(Wre, Wim, fields, precision=None):
    """Apply the z-axis complex matrix to a list of CArr (Nm, Nz, Nr).

    Concatenates all re/im planes along the trailing axis into one GEMM.
    """
    n = len(fields)
    Nm, Nz, Nr = fields[0].shape
    pe = Wre.dtype
    Q = jnp.concatenate([x for F in fields for x in (F.re, F.im)], axis=-1)
    prec = precision or _PRECISION
    A = jnp.einsum("uz,mzq->muq", Wre, Q, preferred_element_type=pe,
                   precision=prec)
    B = jnp.einsum("uz,mzq->muq", Wim, Q, preferred_element_type=pe,
                   precision=prec)
    out = []
    for i in range(n):
        re_sl = slice((2 * i) * Nr, (2 * i + 1) * Nr)
        im_sl = slice((2 * i + 1) * Nr, (2 * i + 2) * Nr)
        # (re + i im) * (Wre + i Wim)
        out.append(CArr(A[..., re_sl] - B[..., im_sl],
                        A[..., im_sl] + B[..., re_sl]))
    return out


def fft_z_many(mats: TransformMatrices, fields, precision=None):
    if mats.W1f_re is not None:
        return _zmatmul_fourstep_many(mats, fields, forward=True,
                                      precision=precision)
    if mats.WfM_re is not None:
        return _zmatmul_split_many(mats.WfM_re, mats.WfM_im,
                                   mats.twf_re, mats.twf_im, fields,
                                   precision=precision)
    return _zmatmul_many(mats.Wf_re, mats.Wf_im, fields,
                         precision=precision)


def ifft_z_many(mats: TransformMatrices, fields, precision=None):
    if mats.W1i_re is not None:
        return _zmatmul_fourstep_many(mats, fields, forward=False,
                                      precision=precision)
    if mats.WiM_re is not None:
        return _zmatmul_split_many(mats.WiM_re, mats.WiM_im,
                                   mats.twi_re, mats.twi_im, fields,
                                   precision=precision)
    return _zmatmul_many(mats.Wi_re, mats.Wi_im, fields,
                         precision=precision)


def _dht_many(M_list, fields, precision=None):
    """Batched DHT over (matrix, field) pairs sharing the mode batch.

    M_list: list of (Nm, Nr, Nr); fields: matching list of CArr.
    One einsum with batch dim = len(list) * Nm.
    """
    M = jnp.concatenate(M_list, axis=0)
    Fre = jnp.concatenate([F.re for F in fields], axis=0)
    Fim = jnp.concatenate([F.im for F in fields], axis=0)
    pe = M.dtype
    prec = precision or _PRECISION
    Re = jnp.einsum("bzr,brs->bzs", Fre, M, preferred_element_type=pe,
                   precision=prec)
    Im = jnp.einsum("bzr,brs->bzs", Fim, M, preferred_element_type=pe,
                   precision=prec)
    Nm = fields[0].shape[0]
    return [CArr(Re[i * Nm:(i + 1) * Nm], Im[i * Nm:(i + 1) * Nm])
            for i in range(len(fields))]


def spect2interp_EB_fields(mats: TransformMatrices, Ep, Em, Ez, Bp, Bm, Bz):
    """Fused spect->interp for all 6 E/B components."""
    p_e, m_e, z_e, p_b, m_b, z_b = _dht_many(
        [mats.invMp, mats.invMm, mats.invM0,
         mats.invMp, mats.invMm, mats.invM0],
        [Ep, Em, Ez, Bp, Bm, Bz], precision=_PRECISION_EB)
    Er, Et = pm_to_rt(p_e, m_e)
    Br, Bt = pm_to_rt(p_b, m_b)
    out = ifft_z_many(mats, [Er, Et, z_e, Br, Bt, z_b],
                      precision=_PRECISION_EB)
    return tuple(out)  # (Er, Et, Ez, Br, Bt, Bz)


def interp2spect_EB_fields(mats: TransformMatrices, Er, Et, Ez, Br, Bt, Bz):
    """Fused interp->spect for all 6 E/B components."""
    fr_e, ft_e, fz_e, fr_b, ft_b, fz_b = fft_z_many(
        mats, [Er, Et, Ez, Br, Bt, Bz], precision=_PRECISION_EB)
    p_e, m_e = rt_to_pm(fr_e, ft_e)
    p_b, m_b = rt_to_pm(fr_b, ft_b)
    Ep, Em, Ez_s, Bp, Bm, Bz_s = _dht_many(
        [mats.Mp, mats.Mm, mats.M0, mats.Mp, mats.Mm, mats.M0],
        [p_e, m_e, fz_e, p_b, m_b, fz_b], precision=_PRECISION_EB)
    return Ep, Em, Ez_s, Bp, Bm, Bz_s


def interp2spect_J_fields(mats: TransformMatrices, Jr, Jt, Jz):
    """Fused interp->spect for the three current components."""
    fr, ft, fz = fft_z_many(mats, [Jr, Jt, Jz])
    p, m = rt_to_pm(fr, ft)
    Jp, Jm, Jz_s = _dht_many([mats.Mp, mats.Mm, mats.M0], [p, m, fz])
    return Jp, Jm, Jz_s


def interp2spect_rho_J_fields(mats: TransformMatrices, rho, Jr, Jt, Jz):
    """Fused interp->spect for rho + J together (one GEMM stage)."""
    frho, fr, ft, fz = fft_z_many(mats, [rho, Jr, Jt, Jz])
    p, m = rt_to_pm(fr, ft)
    rho_s, Jp, Jm, Jz_s = _dht_many(
        [mats.M0, mats.Mp, mats.Mm, mats.M0], [frho, p, m, fz])
    return rho_s, Jp, Jm, Jz_s
