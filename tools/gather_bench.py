"""Microbenchmark: TPU gather cost vs row width / index count / source.

Establishes the cost model for the deposition data path (see
PERF_NOTES.md).  Slope-timed like profile_hot.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N1, N2 = 4, 16
REPS = 5


def slope_ms(jitted, carry):
    import jax
    ts = {}
    for n in (N1, N2):
        jax.block_until_ready(jitted(n, carry))
        best = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(n, carry))
            best.append(time.perf_counter() - t0)
        ts[n] = np.median(best)
    return (ts[N2] - ts[N1]) / (N2 - N1) * 1e3


def make_loop(body):
    import jax
    return jax.jit(
        lambda n, carry: jax.lax.fori_loop(0, n, body, carry),
        static_argnums=(0,))


def main():
    import jax
    import jax.numpy as jnp

    NP = 964224          # ring capacity
    NPAD = 1285632       # Nz*K padded slots
    rng = np.random.default_rng(0)

    for n_idx in (NP, NPAD):
        idx_rand = jnp.asarray(rng.integers(0, NP, size=n_idx),
                               dtype=jnp.int32)
        idx_seq = jnp.clip(
            jnp.arange(n_idx, dtype=jnp.int32), 0, NP - 1)
        for C in (1, 4, 11, 24, 96):
            src = jnp.asarray(
                rng.standard_normal((NP, C)).astype(np.float32))

            def body(i, carry, src=src, idx=idx_rand):
                out = src[(idx + i) % NP]
                return carry + 1e-38 * jnp.sum(out)
            t = slope_ms(make_loop(body), jnp.float32(0))
            print(f"idx={n_idx:8d} C={C:3d} random : {t:7.2f} ms "
                  f"({t*1e6/n_idx:5.2f} ns/idx)", flush=True)
            if C == 11:
                def body2(i, carry, src=src, idx=idx_seq):
                    out = src[(idx + i) % NP]
                    return carry + 1e-38 * jnp.sum(out)
                t = slope_ms(make_loop(body2), jnp.float32(0))
                print(f"idx={n_idx:8d} C={C:3d} seq    : {t:7.2f} ms "
                      f"({t*1e6/n_idx:5.2f} ns/idx)", flush=True)

    # transposed source (C, NP): gather along axis=1
    for C in (11,):
        srcT = jnp.asarray(
            rng.standard_normal((C, NP)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, NP, size=NPAD), jnp.int32)

        def bodyT(i, carry, srcT=srcT, idx=idx):
            out = srcT[:, (idx + i) % NP]
            return carry + 1e-38 * jnp.sum(out)
        t = slope_ms(make_loop(bodyT), jnp.float32(0))
        print(f"idx={NPAD:8d} C={C:3d} (C,NP).T: {t:7.2f} ms "
              f"({t*1e6/NPAD:5.2f} ns/idx)", flush=True)

    # one-hot matmul as a "gather": out[k,:] = sum_j onehot[k,j] src[j,:]
    # (only viable within small windows, just to calibrate MXU gather)
    # windowed two-level: sorted rows then near-contiguous pad windows
    starts = np.sort(rng.integers(0, NP, size=1117)).astype(np.int32)
    starts[0], starts[-1] = 0, NP
    K = 1152
    pos = jnp.asarray(
        np.clip(starts[:1116, None] + np.arange(K)[None, :], 0,
                NP - 1).reshape(-1), jnp.int32)
    src11 = jnp.asarray(rng.standard_normal((NP, 11)).astype(np.float32))

    def body_win(i, carry, src=src11, pos=pos):
        out = src[jnp.minimum(pos + i, NP - 1)]
        return carry + 1e-38 * jnp.sum(out)
    t = slope_ms(make_loop(body_win), jnp.float32(0))
    print(f"windowed pad gather (NP,11)->{NPAD}: {t:7.2f} ms", flush=True)

    # dynamic-slice per column via vmap (window read, no per-index)
    def body_dyn(i, carry, src=src11):
        st = jnp.asarray(starts[:1116], jnp.int32)

        def one(s):
            return jax.lax.dynamic_slice(src, (s, 0), (K, 11))
        out = jax.vmap(one)(jnp.minimum(st + i, NP - K))
        return carry + 1e-38 * jnp.sum(out)
    t = slope_ms(make_loop(body_dyn), jnp.float32(0))
    print(f"vmapped dynamic_slice (1116 x {K},11): {t:7.2f} ms",
          flush=True)

    # multi-operand sort: carry 11 f32 payloads through the sort
    key = jnp.asarray(rng.integers(0, 1117, size=NP), jnp.int32)
    vals = [jnp.asarray(rng.standard_normal(NP).astype(np.float32))
            for _ in range(11)]

    def body_sortmulti(i, carry):
        outs = jax.lax.sort(((key + i) % 1117,) + tuple(vals),
                            num_keys=1)
        return carry + 1e-38 * sum(jnp.sum(o) for o in outs[1:])
    t = slope_ms(make_loop(body_sortmulti), jnp.float32(0))
    print(f"12-operand lax.sort ({NP}): {t:7.2f} ms", flush=True)

    def body_sort2(i, carry):
        outs = jax.lax.sort(
            ((key + i) % 1117, jnp.arange(NP, dtype=jnp.int32)),
            num_keys=1)
        return carry + 1e-38 * jnp.sum(outs[1]).astype(jnp.float32)
    t = slope_ms(make_loop(body_sort2), jnp.float32(0))
    print(f"2-operand lax.sort ({NP}): {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
