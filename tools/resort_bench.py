"""Microbench: strategies for the banded re-sort's permutation apply.

The banded re-sort (sorted_deposit.banded_column_resort) currently
pushes all ~14 payload channels through one row-wise lax.sort of
(Nz, 3K) -- measured 8.8 ms/step at bench size (tools/profile_ops.py),
~40% of the whole step.  The permutation itself needs NO sort: the
kept candidates keep their expanded order, so destination slot =
(exclusive cumsum of kept along the row).  This tool measures ways to
APPLY that permutation:

  sort14   : current -- one lax.sort, key + 13 payload channels
  sort2+ta : lax.sort (key, iota) only, then take_along_axis per channel
  cumsum+ta: no sort -- src indices from a 1-channel iota sort of dest,
             then take_along_axis per channel
  onehot   : no sort -- dest from cumsum, payload applied as a batched
             MXU matmul against the on-the-fly one-hot
             (dest[d, j] == k), channels x 3 bf16 splits as the M dim
             (split exact: 3 x 8 mantissa bits cover f32's 24)

Usage: python tools/resort_bench.py [Nz K] (defaults 1116 1152)

MEASURED VERDICT (TPU v5e, bench shapes Nz=1116 K=1152, 2026-08-19):
  sort14    :   0.067 ms   (exact)
  sort2_ta  : 174.255 ms   (exact -- take_along_axis lowers to a
                            serialized gather loop on TPU; unusable)
  onehot    :  12.462 ms   (and 1.5e-2 abs error from the bf16 split)
  cumsum_ta : 189.741 ms   (exact; same gather-loop problem)
KEEP sort14.  The 8.8 ms attributed to the sort by profile_ops.py was
span inflation (~30x, see tools/trace_idle.py) -- the fused row-wise
multi-payload lax.sort is already near free at these shapes; the
banded re-sort is NOT the bottleneck.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

Nz = int(sys.argv[1]) if len(sys.argv) > 1 else 1116
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1152
BAND = 1
NCH = 13
W = (2 * BAND + 1) * K


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # stored layout: row == column one step ago; cols move by <= BAND
    cols = (np.arange(Nz)[:, None]
            + rng.integers(-BAND, BAND + 1, size=(Nz, K))) % Nz
    live = rng.random((Nz, K)) < 0.85
    cols = np.where(live, cols, -1)
    chans = [rng.standard_normal((Nz, K)).astype(np.float32)
             for _ in range(NCH)]
    colsj = jnp.asarray(cols.astype(np.int32))
    chansj = [jnp.asarray(a) for a in chans]

    offsets = list(range(-BAND, BAND + 1))

    def expand(a):
        return jnp.concatenate(
            [jnp.roll(a, -o, axis=0) for o in offsets], axis=1)

    def kept_of(col):
        dest = jnp.arange(Nz, dtype=jnp.int32)[:, None]
        delta = expand(col) - dest
        delta = jnp.mod(delta + Nz // 2, Nz) - Nz // 2
        return (expand(col) >= 0) & (delta == 0)

    def f_sort14(col, chs):
        kept = kept_of(col)
        key = jnp.where(kept, jnp.arange(W, dtype=jnp.int32)[None, :], W)
        outs = jax.lax.sort((key,) + tuple(expand(a) for a in chs),
                            dimension=1, num_keys=1)
        return [o[:, :K] for o in outs[1:]], outs[0][:, :K] < W

    def f_sort2_ta(col, chs):
        kept = kept_of(col)
        key = jnp.where(kept, jnp.arange(W, dtype=jnp.int32)[None, :], W)
        skey, src = jax.lax.sort(
            (key, jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32),
                                   (Nz, W))),
            dimension=1, num_keys=1)
        src = src[:, :K]
        out = [jnp.take_along_axis(expand(a), src, axis=1) for a in chs]
        return out, skey[:, :K] < W

    def f_onehot(col, chs):
        kept = kept_of(col)
        # dest slot of each kept candidate = its rank among kept
        rank = jnp.cumsum(kept.astype(jnp.int32), axis=1) - 1
        dest = jnp.where(kept, rank, K)  # K = dropped
        valid = jnp.arange(K)[None, :] < jnp.sum(
            kept, axis=1, dtype=jnp.int32)[:, None]
        # 3-way bf16 split (exact: 3 x 8 bits >= f32's 24)
        ms = []
        for a in chs:
            ae = expand(a)
            b0 = ae.astype(jnp.bfloat16)
            r1 = ae - b0.astype(jnp.float32)
            b1 = r1.astype(jnp.bfloat16)
            b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
            ms += [b0, b1, b2]
        A = jnp.stack(ms, axis=1)  # (Nz, 3*NCH, W) bf16
        oh = (dest[:, :, None] == jnp.arange(K, dtype=jnp.int32)
              [None, None, :]).astype(jnp.bfloat16)  # (Nz, W, K)
        out = jax.lax.dot_general(
            A, oh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Nz, 3*NCH, K)
        res = [out[:, 3 * i] + out[:, 3 * i + 1] + out[:, 3 * i + 2]
               for i in range(NCH)]
        return res, valid

    def f_cumsum_ta(col, chs):
        kept = kept_of(col)
        rank = jnp.cumsum(kept.astype(jnp.int32), axis=1) - 1
        dest = jnp.where(kept, rank, K)  # K/overflow -> dropped
        # invert: src[d, k] = j with dest[d, j] == k (scatter iota;
        # out-of-range dest rows are dropped)
        src = jnp.zeros((Nz, K), jnp.int32).at[
            jnp.arange(Nz)[:, None], dest].set(
                jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (Nz, W)),
                mode="drop")
        valid = jnp.arange(K)[None, :] < jnp.sum(
            kept, axis=1, dtype=jnp.int32)[:, None]
        out = [jnp.take_along_axis(expand(a), src, axis=1) for a in chs]
        return out, valid

    fns = dict(sort14=f_sort14, sort2_ta=f_sort2_ta,
               onehot=f_onehot, cumsum_ta=f_cumsum_ta)
    ref = None
    for name, f in fns.items():
        jf = jax.jit(f)
        out, valid = jf(colsj, chansj)
        jax.block_until_ready(out)
        NIT = 30
        t0 = time.perf_counter()
        for _ in range(NIT):
            out, valid = jf(colsj, chansj)
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / NIT * 1e3
        v = np.asarray(valid)
        o0 = np.where(v, np.asarray(out[0]), 0.0)
        if ref is None:
            ref = o0
            err = 0.0
        else:
            err = float(np.max(np.abs(o0 - ref)))
        print(f"{name:10s}: {ms:7.3f} ms   max|diff vs sort14| = {err:g}", flush=True)


if __name__ == "__main__":
    main()
