"""Unit tests for the spectral core: DHT round-trip, transforms, PSATD.

Mirrors the reference's test strategy for the Hankel transform
(/root/reference/tests/unautomated/test_hankel.py): self-inverse and
accuracy on analytically-known transforms.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import jn, jn_zeros

from fbpic_tpu.fields.hankel import dht_matrices
from fbpic_tpu.fields.transform import (
    TransformMatrices, interp2spect_scal, spect2interp_scal,
    interp2spect_vect, spect2interp_vect,
)
from fbpic_tpu.utils.complex_arr import CArr
from fbpic_tpu.fields.stencil import get_modified_k
from fbpic_tpu.fields import GridConfig, build_field_aux, SpectralFields
from fbpic_tpu.fields.psatd_push import push_eb_standard
from fbpic_tpu.constants import c


@pytest.mark.parametrize("m,p", [(0, 0), (0, 1), (1, 0), (1, 1), (1, 2),
                                 (2, 1), (2, 2), (2, 3)])
def test_dht_self_inverse(m, p):
    """M @ invM should be the identity on the representable subspace."""
    Nr = 64
    rmax = 40.0e-6
    M, invM, nu = dht_matrices(p, m, Nr, rmax)
    # Round trip: start from spectral space (always representable)
    G = np.random.RandomState(0).randn(Nr)
    F = G @ invM
    G2 = F @ M
    if m != 0 and p != m - 1:
        # The nu=0 mode column is projected out for m != 0, p != m-1
        assert np.allclose(G2[1:], G[1:], atol=1e-9 * np.abs(G).max())
    else:
        assert np.allclose(G2, G, atol=1e-9 * np.abs(G).max())


def test_dht_bessel_mode():
    """A pure Bessel mode transforms to a single spectral coefficient."""
    Nr = 128
    rmax = 1.0
    M, invM, nu = dht_matrices(0, 0, Nr, rmax)
    r = (rmax / Nr) * (np.arange(Nr) + 0.5)
    # 5th zero of J0
    alpha = jn_zeros(0, 8)
    F = jn(0, alpha[4] * r / rmax)
    G = F @ M
    # Spectral peak at index 4
    assert np.argmax(np.abs(G)) == 4
    assert np.abs(G[np.arange(Nr) != 4]).max() < 1e-8 * np.abs(G[4])


def test_transform_roundtrip_batched():
    """spect->interp->spect round trip for scalar and vector, all modes."""
    Nm, Nz, Nr = 3, 32, 32
    rmax = 20e-6
    mats = TransformMatrices.build(Nm, Nr, Nz, rmax)
    rng = np.random.RandomState(1)
    G_np = rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr)
    G = CArr.from_numpy(G_np, jnp.float64)

    # Scalar
    F = spect2interp_scal(mats, G)
    G2 = interp2spect_scal(mats, F).to_numpy()
    # Mode m>0 spectral index 0 is projected out by the scalar transform
    np.testing.assert_allclose(G2[0], G_np[0], atol=1e-9)
    np.testing.assert_allclose(G2[1:, :, 1:], G_np[1:, :, 1:], atol=1e-9)

    # Vector
    Gp_np = rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr)
    Gm_np = rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr)
    # Project out the nu=0 column for the + transform (p=m+1 > m-1)
    Gp_np[1:, :, 0] = 0.0
    Gp = CArr.from_numpy(Gp_np, jnp.float64)
    Gm = CArr.from_numpy(Gm_np, jnp.float64)
    Fr, Ft = spect2interp_vect(mats, Gp, Gm)
    Gp2, Gm2 = interp2spect_vect(mats, Fr, Ft)
    np.testing.assert_allclose(Gp2.to_numpy(), Gp_np, atol=1e-8)
    np.testing.assert_allclose(Gm2.to_numpy(), Gm_np, atol=1e-8)


def test_modified_k_converges_to_true_k():
    """High-order stencil's [k] approaches k at low frequency."""
    Nz, dz = 128, 1e-7
    k = 2 * np.pi * np.fft.fftfreq(Nz, dz)
    k32 = get_modified_k(k, 32, dz)
    low = np.abs(k) < 0.2 * np.abs(k).max()
    np.testing.assert_allclose(k32[low], k[low], rtol=1e-5)
    # Infinite order returns k itself
    assert get_modified_k(k, -1, dz) is k


def test_psatd_vacuum_energy_conservation():
    """A vacuum mode pushed by PSATD conserves |E|^2 + c^2|B|^2 exactly."""
    Nm, Nz, Nr = 2, 64, 32
    rmax = 20e-6
    dz = 1e-6
    config = GridConfig(Nz=Nz, Nr=Nr, Nm=Nm, dz=dz, dr=rmax / Nr, rmax=rmax,
                        dt=0.5 * dz / c)
    aux = build_field_aux(config)
    fld = SpectralFields.zeros(config)

    rng = np.random.RandomState(3)
    # A random transverse E field; B chosen as 0 (standing wave)
    Ep = CArr.from_numpy(
        rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr), jnp.float64)

    def energy(Ep, Em, Ez, Bp, Bm, Bz):
        # In the (+,-,z) basis |Fp|^2+|Fm|^2 = (|Fr|^2+|Ft|^2)/2, so the
        # conserved quadratic form weights the z components by 1/2.
        return float(
            np.sum(Ep.abs2() + Em.abs2() + 0.5 * Ez.abs2())
            + c**2 * np.sum(Bp.abs2() + Bm.abs2() + 0.5 * Bz.abs2())
        )

    E = [Ep, CArr.zeros_like(Ep), CArr.zeros_like(Ep)]
    B = [CArr.zeros_like(Ep)] * 3
    zeros = CArr.zeros_like(Ep)
    e0 = energy(*E, *B)
    for _ in range(20):
        out = push_eb_standard(
            *E, *B, zeros, zeros, zeros, zeros, zeros,
            aux.rho_prev_coef, aux.rho_next_coef, aux.j_coef,
            aux.C, aux.S_w, aux.kr, aux.kz, config.dt,
        )
        E = list(out[:3])
        B = list(out[3:])
    e1 = energy(*E, *B)
    # Standing wave energy oscillates between E and B; total is conserved
    assert abs(e1 - e0) / e0 < 1e-10


@pytest.mark.parametrize("Nz", [800, 1024, 4096, 4500])
def test_z_transform_matches_numpy_fft(Nz):
    """fft_z / ifft_z match np.fft for every factorization path.

    Nz=800 takes the one-level radix split, 1024 the radix split
    (no balanced >=64 factorization below 4096), 4096 the four-step
    (64 x 64), 4500 the four-step with unequal factors (75 x 60 is
    rejected by the >=64 rule -> falls to (4500/67..) -- whatever
    dft_factorization_arrays picks, the result must be exact).
    """
    from fbpic_tpu.fields.transform import (
        fft_z, ifft_z, fft_z_many, ifft_z_many, dft_factorization_arrays,
        dft_matrices, fourstep_dft_matrices, FOURSTEP_MIN_NZ)
    Nm, Nr = 2, 5
    rng = np.random.RandomState(7)
    F_np = rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr)
    F = CArr.from_numpy(F_np, jnp.float64)

    dev = lambda v: jnp.asarray(v, dtype=jnp.float64)
    Wf, Wi = dft_matrices(min(Nz, 8))  # placeholder when factorized
    extra = dft_factorization_arrays(Nz, dev)
    if not extra:
        Wf, Wi = dft_matrices(Nz)
    mats = TransformMatrices(
        M0=None, invM0=None, Mp=None, invMp=None, Mm=None, invMm=None,
        kr=None, Wf_re=dev(Wf.real), Wf_im=dev(Wf.imag),
        Wi_re=dev(Wi.real), Wi_im=dev(Wi.imag), **extra)
    if Nz >= 4096:
        # The large-Nz path must actually be sub-quadratic (four-step)
        assert mats.W1f_re is not None, \
            f"four-step not active at Nz={Nz}"

    G = fft_z(mats, F).to_numpy()
    G_ref = np.fft.fft(F_np, axis=1)
    np.testing.assert_allclose(G, G_ref, atol=1e-8 * np.abs(G_ref).max())

    F2 = ifft_z(mats, CArr.from_numpy(G_ref, jnp.float64)).to_numpy()
    np.testing.assert_allclose(F2, F_np, atol=1e-10 * np.abs(F_np).max())

    # The fused multi-field variants share the factorization
    F_np2 = rng.randn(Nm, Nz, Nr) + 1j * rng.randn(Nm, Nz, Nr)
    outs = fft_z_many(mats, [F, CArr.from_numpy(F_np2, jnp.float64)])
    np.testing.assert_allclose(outs[1].to_numpy(),
                               np.fft.fft(F_np2, axis=1),
                               atol=1e-8 * np.abs(G_ref).max())
    back = ifft_z_many(mats, outs)
    np.testing.assert_allclose(back[0].to_numpy(), F_np,
                               atol=1e-10 * np.abs(F_np).max())


def test_fourstep_in_full_solver():
    """A vacuum laser propagated on an Nz=4096 grid (four-step DFT
    path) keeps its energy and propagates at c -- integration check of
    the large-Nz factorization inside the PSATD solver."""
    import jax.numpy as jnp
    from fbpic_tpu import Simulation
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    Nz, Nr, Nm = 4096, 16, 2
    zmax, rmax = 160.e-6, 25.e-6
    dt = zmax / Nz / c
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt, zmin=0.,
                     boundaries={"z": "periodic", "r": "reflective"},
                     verbose_level=0)
    assert sim.aux.mats.W1f_re is not None, "four-step not active"
    add_laser_pulse(sim, GaussianLaser(a0=0.1, waist=12.e-6,
                                       tau=15.e-15, z0=40.e-6))

    def em_energy():
        # Full conserved quadratic form (E and B exchange energy;
        # any single component oscillates at the 1e-4 level)
        r = (np.arange(Nr) + 0.5) * (rmax / Nr)
        tot = 0.0
        for name in ("Er", "Et", "Ez"):
            for m in range(Nm):
                F = np.asarray(sim.get_interp_field(name, m))
                w_m = 1.0 if m == 0 else 2.0
                tot += w_m * float(np.sum(np.abs(F) ** 2 * r[None, :]))
        for name in ("Br", "Bt", "Bz"):
            for m in range(Nm):
                F = np.asarray(sim.get_interp_field(name, m))
                w_m = 1.0 if m == 0 else 2.0
                tot += w_m * c**2 * float(
                    np.sum(np.abs(F) ** 2 * r[None, :]))
        return tot

    def centroid():
        Et = np.asarray(sim.get_interp_field("Et", 1))
        w = np.abs(Et[:, 0]) ** 2
        return float(np.sum(w * np.arange(Nz)) / np.sum(w))

    e0, c0_ = em_energy(), centroid()
    N = 200
    sim.step(N, show_progress=False)
    e1, c1_ = em_energy(), centroid()
    assert abs(e1 - e0) / e0 < 1e-6          # vacuum: energy conserved
    moved = (c1_ - c0_) * (zmax / Nz)
    assert abs(moved - N * c * dt) < 2 * zmax / Nz   # group velocity ~ c
