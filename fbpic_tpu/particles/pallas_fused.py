"""Pallas TPU kernel for the fused J + d(rho) one-hot contraction.

The production deposition (sorted_deposit.deposit_rho_J_sorted with
with_drho=True) contracts per-particle channel values against a
one-hot radial indicator:

    out[col, ir, w] = sum_k S[col, k, ir] * V[col, k, w]

where V concatenates n_offJ*2 J blocks and n_offD*2 d(rho) blocks
(W = n_offJ*2*CJ + n_offD*2*CD channels; 132 at Nm=2).  In plain XLA
the V blocks must be materialized for the einsum -- 3 bf16 terms x
(Nz, K, W) ~= 1 GB of HBM writes + 1 GB of reads per step at bench
size -- and the (Nz, K, W)-sized zwv/sr intermediates inflate the
elementwise fusion cost on top.  Compute is trivial (~0.3 ms of MXU
at bench size): the XLA path is purely HBM-bound.

This kernel builds V and the one-hot S in VMEM per z-row and feeds
the MXU directly; the only HBM traffic is the per-particle (Nz, K)
inputs (~210 MB) and the (Nz, 64, Wp) output (~70 MB).  The math is
algebraically identical to the XLA path (sorted_deposit._build_V /
_build_V_span_diff / _contract) -- same bf16 split of V
(_N_BF16_TERMS terms, honoring FBPIC_TPU_DEPOSIT_PRECISION) against
an exact-bf16 one-hot S with f32 MXU accumulation -- and equal up to
f32 rounding of term grouping (the V_D expression groups products
slightly differently), so results agree to f32-rounding level.

MEASURED (TPU v5e, bench.py LWFA config, Nz=1116 Nr=50 Nm=2,
576k particles): fused deposit contraction 6.5 ms (XLA einsum path)
-> 4.9 ms (this kernel); whole step 22.6 -> 21.1 ms/step
(bench 38.2 -> 36.6 ns/particle/step).  tools/deposit_bench.py
isolates the contraction; bench.py measures the full step.

Reference behavior being replaced: cell-sorted register accumulation
on CUDA (/root/reference/fbpic/particles/deposition/cuda_methods.py:
28-195); the one-hot contraction itself is original TPU-first design.
"""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(x, m):
    return -(-x // m) * m


def pallas_fused_enabled(dtype):
    """Production gate: f32 on a non-CPU backend, unless opted out.

    FBPIC_TPU_PALLAS_DEPOSIT: "auto" (default; on for f32 on an
    accelerator), "0" (off), "1" (force on), "interpret" (force on in
    Pallas interpreter mode -- CPU parity tests)."""
    mode = os.environ.get("FBPIC_TPU_PALLAS_DEPOSIT", "auto")
    if mode == "0":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if mode in ("1", "interpret"):
        return True
    try:
        # TPU only: the kernel uses pltpu.VMEM BlockSpecs and MXU
        # assumptions and would fail to lower on CUDA/ROCm backends.
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _interpret_mode():
    return os.environ.get("FBPIC_TPU_PALLAS_DEPOSIT", "auto") == "interpret"


@functools.partial(
    jax.jit, static_argnames=(
        "n_offJ", "n_offD", "CJ", "CD", "NRP", "Wp", "BZ",
        "metaJ", "metaD", "n_terms", "interpret"))
def _fused_contract_call(chJ, zwJ, sA, dph, phb, zwa, zwb, tables,
                         n_offJ, n_offD, CJ, CD, NRP, Wp, BZ,
                         metaJ, metaD, n_terms=3, interpret=False):
    """pallas_call wrapper.  Returns out (Nz, NRP, Wp) f32 with
    out[:, :, :W] = the einsum result (W = n_offJ*2*CJ + n_offD*2*CD).

    chJ (Nz, CJ, K): J channel values (mode phases + wj applied)
    zwJ (Nz, n_offJ, K): per-offset z weights of the J deposit
    sA  (Nz, 8, K): rows [sr0_m0, sr0_mh, below, ir_buf, bn, u_a,
                          u_b, wj]
    dph/phb (Nz, CD, K): endpoint phase difference / endpoint phase
    zwa/zwb (Nz, n_offD, K): endpoint per-offset z weights
    tables (2, NT): ruyten[0], ruyten[1] padded to NT (lane mult)
    metaJ/metaD: tuples (is_mode0 tuple, flip tuple) per channel
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nz, _, K = chJ.shape
    NT = tables.shape[1]
    W = n_offJ * 2 * CJ + n_offD * 2 * CD
    f32 = jnp.float32

    def _sr_rows(meta_is0, meta_flip, s_m0, s_mh, below):
        """Per-channel (C, K) lower/upper radial weights.

        meta is STATIC (python tuples): the mode-row select happens at
        trace time per channel, the below-axis flip is a python-float
        multiply -- no captured constant arrays (pallas kernels must
        not close over tracer-level constants)."""
        rows0, rows1 = [], []
        for is0, flip in zip(meta_is0, meta_flip):
            row = s_m0 if is0 > 0 else s_mh
            rows1.append(1.0 - row)
            rows0.append(jnp.where(below > 0, flip * row, row))
        return (jnp.concatenate(rows0, axis=0),
                jnp.concatenate(rows1, axis=0))

    def kernel(chJ_ref, zwJ_ref, sA_ref, dph_ref, phb_ref, zwa_ref,
               zwb_ref, tab_ref, out_ref):
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (NRP, K), 0)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (NT, K), 0)
        t0 = tab_ref[0:1, :]                     # (1, NT)
        t1 = tab_ref[1:2, :]
        for b in range(BZ):
            sr0m0 = sA_ref[b, 0:1, :]            # (1, K)
            sr0mh = sA_ref[b, 1:2, :]
            below = sA_ref[b, 2:3, :]
            irf = sA_ref[b, 3:4, :]
            bn = sA_ref[b, 4:5, :]
            u_a = sA_ref[b, 5:6, :]
            u_b = sA_ref[b, 6:7, :]
            wj = sA_ref[b, 7:8, :]

            # --- V_J blocks (sorted_deposit._build_V)
            chJ_b = chJ_ref[b]                   # (CJ, K)
            sr0, sr1 = _sr_rows(metaJ[0], metaJ[1], sr0m0, sr0mh, below)
            blocks = []
            for o in range(n_offJ):
                zwv = chJ_b * zwJ_ref[b, o:o + 1, :]
                blocks.append(zwv * sr0)
                blocks.append(zwv * sr1)

            # --- V_D blocks (sorted_deposit._build_V_span_diff)
            # Ruyten rows looked up on the MXU: one-hot(bn) against
            # the padded tables (a per-lane table gather would
            # serialize on TPU).  f32 HIGHEST keeps the table exact.
            Sbn = (iota_t == bn.astype(jnp.int32)).astype(f32)  # (NT, K)
            tb = jnp.concatenate([t0, t1], axis=0)
            rt = jax.lax.dot_general(
                tb, Sbn, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)       # (2, K)
            rt0, rt1 = rt[0:1, :], rt[1:2, :]

            def corners(u):
                corr = (1.0 - u) * u
                s_m0 = (1.0 - u) + rt0 * corr
                s_mh = (1.0 - u) + rt1 * corr
                return _sr_rows(metaD[0], metaD[1], s_m0, s_mh, below)

            s0a, s1a = corners(u_a)
            s0b, s1b = corners(u_b)
            ds0 = s0b - s0a
            ds1 = s1b - s1a
            dph_b = dph_ref[b]                   # (CD, K)
            phb_b = phb_ref[b]
            for o in range(n_offD):
                za = zwa_ref[b, o:o + 1, :]
                zb = zwb_ref[b, o:o + 1, :]
                dzw = zb - za
                blocks.append(wj * (dph_b * (za * s0a)
                                    + phb_b * (dzw * s0a + zb * ds0)))
                blocks.append(wj * (dph_b * (za * s1a)
                                    + phb_b * (dzw * s1a + zb * ds1)))

            V = jnp.concatenate(blocks, axis=0)  # (W, K)
            S = (iota_r == irf.astype(jnp.int32)
                 ).astype(jnp.bfloat16)                    # (NRP, K)

            # 3-term bf16 split of V against the exact-bf16 one-hot S,
            # f32 MXU accumulation (sorted_deposit._contract).  The
            # interpreter does NOT model the MXU's f32 accumulation of
            # bf16 products (it accumulates in bf16), so interpret
            # mode upcasts the already-bf16-rounded operands -- the
            # same numbers the hardware path computes.
            acc = None
            Vr = V
            for t in range(n_terms):
                Vt = Vr.astype(jnp.bfloat16)
                if t < n_terms - 1:
                    Vr = Vr - Vt.astype(f32)
                if interpret:
                    # The interpreter accumulates bf16-input dots in
                    # bf16 (the real MXU accumulates f32): feed it the
                    # bf16-ROUNDED values as f32 at HIGHEST -- exactly
                    # the hardware arithmetic.
                    p = jax.lax.dot_general(
                        S.astype(f32), Vt.astype(f32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    p = jax.lax.dot_general(
                        S, Vt, (((1,), (1,)), ((), ())),
                        preferred_element_type=f32)        # (NRP, W)
                acc = p if acc is None else acc + p
            if Wp > W:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((NRP, Wp - W), f32)], axis=1)
            out_ref[b] = acc

    grid = (Nz // BZ,)
    bspec = lambda C: pl.BlockSpec((BZ, C, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Nz, NRP, Wp), f32),
        grid=grid,
        in_specs=[
            bspec(CJ), bspec(n_offJ), bspec(8), bspec(CD), bspec(CD),
            bspec(n_offD), bspec(n_offD),
            pl.BlockSpec((2, NT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BZ, NRP, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(chJ, zwJ, sA, dph, phb, zwa, zwb, tables)


# Per-kernel VMEM budget: v5e-class chips have 128 MiB of VMEM; the
# XLA default SCOPED limit is 16 MiB, which large configs (Nm=3,
# Nr=120 -> K~2.7k, W=220) exceed.  The kernels raise the scoped limit
# via CompilerParams and size their z-block (BZ) against this budget.
_VMEM_BUDGET = int(os.environ.get(
    "FBPIC_TPU_PALLAS_VMEM_MB", "48")) * 2**20
_VMEM_LIMIT = 2 * _VMEM_BUDGET


def _fused_vmem_bytes(BZ, K, CJ, CD, n_offJ, n_offD, NRP, Wp, NT):
    """Conservative VMEM footprint model of _fused_contract_call.

    Double-buffered operand/output blocks scale with BZ; the unrolled
    row body's stack scratch (V blocks + concat + bf16 split terms +
    the one-hots) is reused across rows (verified against the XLA
    scoped-vmem report at the Nm=3 refexact shape: 16.92M total =
    ~11M blocks + ~5.9M scratch at BZ=8, K=2688, W=220)."""
    W = n_offJ * 2 * CJ + n_offD * 2 * CD
    blocks = (BZ * K * 4 * (CJ + n_offJ + 8 + 2 * CD + 2 * n_offD)
              + BZ * NRP * Wp * 4)
    row = ((2 * W + CJ + CD + 24) * K * 4     # V blocks/temps (f32)
           + W * K * 2                        # bf16 split term
           + NRP * K * 2                      # one-hot S (bf16)
           + NT * K * 4)                      # Ruyten one-hot (f32)
    return 2 * blocks + row


def _pick_bz(Nz, vmem_of_bz=None):
    """Largest BZ dividing Nz whose footprint fits the budget, or
    None when even BZ=1 does not fit (caller falls back to XLA)."""
    for cand in (8, 6, 4, 3, 2, 1):
        if Nz % cand:
            continue
        if vmem_of_bz is None or vmem_of_bz(cand) <= _VMEM_BUDGET:
            return cand
    return None


def fused_onehot_contract(geom, channels, meta, span, dph, ph_b, wj,
                          ruyten, Nm, Nz, Nr, n_offJ, n_offD,
                          interpret=None):
    """Drop-in for `_contract(S, V_J + V_D)` in deposit_rho_J_sorted.

    Returns out_all (Nz, Nrb, W) f32 with the J blocks in
    [..., :n_offJ*2*CJ] and the d(rho) blocks after, exactly like the
    XLA einsum path.
    """
    from .deposit import NGUARD

    Nrb = Nr + 2 * NGUARD
    K = channels.shape[1]
    CJ = channels.shape[2]
    CD = dph.shape[2]
    NRP = _round_up(Nrb, 8)
    W = n_offJ * 2 * CJ + n_offD * 2 * CD
    Wp = _round_up(W, 128)
    NT = _round_up(Nr + 1, 128)
    BZ = _pick_bz(Nz, lambda bz: _fused_vmem_bytes(
        bz, K, CJ, CD, n_offJ, n_offD, NRP, Wp, NT))
    if BZ is None:
        return None            # caller falls back to the XLA einsum
    f32 = jnp.float32

    chJ = jnp.swapaxes(channels, 1, 2)                 # (Nz, CJ, K)
    zwJ = jnp.stack(geom["zw"], axis=1)                # (Nz, n_offJ, K)
    sA = jnp.stack(
        [geom["sr0_m0"], geom["sr0_mh"],
         geom["below_axis"].astype(f32),
         geom["ir_buf"].astype(f32),
         span["bn"].astype(f32),
         span["u_a"], span["u_b"], wj], axis=1)        # (Nz, 8, K)
    dphs = jnp.swapaxes(dph, 1, 2)                     # (Nz, CD, K)
    phbs = jnp.swapaxes(ph_b, 1, 2)
    zwa = jnp.stack(span["zw_a"], axis=1)              # (Nz, n_offD, K)
    zwb = jnp.stack(span["zw_b"], axis=1)
    tables = jnp.zeros((2, NT), f32)
    tables = tables.at[0, :Nr + 1].set(ruyten[0].astype(f32))
    tables = tables.at[1, :Nr + 1].set(ruyten[1].astype(f32))

    # Channel metadata rebuilt STATICALLY from Nm + component parities
    # (deposit._channel_meta layout: comp-major, mode, re/im with the
    # mode-0 imag dropped) -- the caller's `meta` arrays are tracers
    # under jit and the kernel needs python constants.
    def _static_meta(parities):
        is0, flip = [], []
        for par in parities:
            for m in range(Nm):
                msign = 1.0 if m % 2 == 0 else -1.0
                for _part in range(1 if m == 0 else 2):
                    is0.append(1.0 if m == 0 else 0.0)
                    flip.append(par * msign)
        return (tuple(is0), tuple(flip))

    metaJ = _static_meta((-1.0, -1.0, +1.0))   # Jr, Jt, Jz
    metaD = _static_meta((+1.0,))              # rho
    del meta

    if interpret is None:
        interpret = _interpret_mode()
    from .sorted_deposit import _N_BF16_TERMS
    out = _fused_contract_call(
        chJ, zwJ, sA, dphs, phbs, zwa, zwb, tables,
        n_offJ=n_offJ, n_offD=n_offD, CJ=CJ, CD=CD, NRP=NRP, Wp=Wp,
        BZ=BZ, metaJ=metaJ, metaD=metaD, n_terms=_N_BF16_TERMS,
        interpret=interpret)
    return out[:, :Nrb, :W]
