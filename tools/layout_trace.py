"""Trace-based comparison of padded-gather data-path variants.

Wall-clock timing on the shared dev chip is contention-noisy; the XLA
trace's device_duration_ps is not.  Runs each variant in a fori_loop,
captures a trace, and reports per-op device totals.

Usage: python tools/layout_trace.py
"""
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

NP = 964224
NZ, K = 1116, 1152
C = 11
LOOP = 12


def run_variant(name, fn, carry):
    import jax
    tdir = f"/tmp/ltrace/{name}"
    os.makedirs(tdir, exist_ok=True)
    jitted = jax.jit(lambda c: jax.lax.fori_loop(0, LOOP, fn, c))
    jax.block_until_ready(jitted(carry))
    jax.profiler.start_trace(tdir)
    jax.block_until_ready(jitted(carry))
    jax.profiler.stop_trace()
    # parse
    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    tot = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "args" in e and \
                "device_duration_ps" in e.get("args", {}):
            d = int(e["args"]["device_duration_ps"]) / 1e9  # ms
            tot[e["name"]] = tot.get(e["name"], 0.0) + d
    total = sum(tot.values())
    print(f"== {name}: total device {total:.2f} ms "
          f"({total/LOOP:.3f} ms/iter)", flush=True)
    for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:6]:
        print(f"   {d:8.2f} ms  {n}", flush=True)
    return total / LOOP


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    arrays = [jnp.asarray(rng.standard_normal(NP).astype(np.float32))
              for _ in range(C)]
    key0 = jnp.asarray(rng.integers(0, NZ, size=NP), jnp.int32)

    def sort_parts(key):
        ks, perm = jax.lax.sort(
            (key, jnp.arange(NP, dtype=jnp.int32)), num_keys=1)
        starts = jnp.searchsorted(ks, jnp.arange(NZ + 1, dtype=key.dtype))
        pos = starts[:NZ, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        return perm, starts, pos

    # V1: current production path -- idx = perm[clip(pos)], then
    # stack(axis=1)[idx]
    def v1(i, carry):
        key = (key0 + i) % NZ
        perm, starts, pos = sort_parts(key)
        idx = perm[jnp.clip(pos, 0, NP - 1)]
        stacked = jnp.stack(arrays, axis=1)[idx]
        return carry + 1e-38 * jnp.sum(stacked)
    run_variant("v1_current", v1, jnp.float32(0))

    # V2: flatten-barrier-reshape to force a row-major source
    def v2(i, carry):
        key = (key0 + i) % NZ
        perm, starts, pos = sort_parts(key)
        idx = perm[jnp.clip(pos, 0, NP - 1)]
        flat = jnp.stack(arrays, axis=1).reshape(-1)
        flat = jax.lax.optimization_barrier(flat)
        stacked = flat.reshape(NP, C)[idx]
        return carry + 1e-38 * jnp.sum(stacked)
    run_variant("v2_rowmajor", v2, jnp.float32(0))

    # V3: two-stage -- sort rows once (perm gather), then windowed pos
    def v3(i, carry):
        key = (key0 + i) % NZ
        perm, starts, pos = sort_parts(key)
        flat = jnp.stack(arrays, axis=1).reshape(-1)
        flat = jax.lax.optimization_barrier(flat)
        D = flat.reshape(NP, C)
        S1 = D[perm]
        S1 = jax.lax.optimization_barrier(S1.reshape(-1)).reshape(NP, C)
        padded = S1[jnp.clip(pos, 0, NP - 1)]
        return carry + 1e-38 * jnp.sum(padded)
    run_variant("v3_twostage", v3, jnp.float32(0))

    # V4: carry the payload THROUGH the sort (multi-operand lax.sort),
    # then windowed pos gather
    def v4(i, carry):
        key = (key0 + i) % NZ
        outs = jax.lax.sort((key,) + tuple(arrays), num_keys=1)
        ks = outs[0]
        starts = jnp.searchsorted(ks, jnp.arange(NZ + 1, dtype=key.dtype))
        pos = starts[:NZ, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        D = jnp.stack(outs[1:], axis=1)
        flat = jax.lax.optimization_barrier(D.reshape(-1))
        padded = flat.reshape(NP, C)[jnp.clip(pos, 0, NP - 1)]
        return carry + 1e-38 * jnp.sum(padded)
    run_variant("v4_sortpayload", v4, jnp.float32(0))

    # V5: like V2 but gather idx composition fused differently:
    # padded = D[perm[...]] without materializing idx via barrier
    def v5(i, carry):
        key = (key0 + i) % NZ
        perm, starts, pos = sort_parts(key)
        sorted_flat = jnp.stack(arrays, axis=1).reshape(-1)
        sorted_flat = jax.lax.optimization_barrier(sorted_flat)
        D = sorted_flat.reshape(NP, C)
        S1 = D[perm]  # no barrier: let XLA fuse
        padded = S1[jnp.clip(pos, 0, NP - 1)]
        return carry + 1e-38 * jnp.sum(padded)
    run_variant("v5_twostage_fused", v5, jnp.float32(0))


if __name__ == "__main__":
    main()


def main_v6():
    """v6: payload-through-sort + vmapped dynamic_slice windows
    (one XLA gather with slice_sizes=(K, C) -- contiguous DMA blocks
    instead of per-index reads)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    arrays = [jnp.asarray(rng.standard_normal(NP).astype(np.float32))
              for _ in range(C)]
    key0 = jnp.asarray(rng.integers(0, NZ, size=NP), jnp.int32)

    def v6(i, carry):
        key = (key0 + i) % NZ
        outs = jax.lax.sort((key,) + tuple(arrays), num_keys=1)
        ks = outs[0]
        starts = jnp.searchsorted(ks, jnp.arange(NZ + 1, dtype=key.dtype))
        D = jnp.stack(outs[1:], axis=1)                      # (NP, C)
        D = jnp.concatenate(
            [D, jnp.zeros((K, C), D.dtype)], axis=0)         # in-bounds pad
        padded = jax.vmap(
            lambda s: jax.lax.dynamic_slice(D, (s, 0), (K, C))
        )(starts[:NZ])                                       # (NZ, K, C)
        return carry + 1e-38 * jnp.sum(padded)
    run_variant("v6_sort_dynslice", v6, jnp.float32(0))

    # v7: same but WITHOUT stacking -- slice each channel separately
    # (avoids the (NP, C) transpose-stack materialization)
    def v7(i, carry):
        key = (key0 + i) % NZ
        outs = jax.lax.sort((key,) + tuple(arrays), num_keys=1)
        ks = outs[0]
        starts = jnp.searchsorted(ks, jnp.arange(NZ + 1, dtype=key.dtype))
        tot = carry
        for ch in outs[1:]:
            chp = jnp.concatenate([ch, jnp.zeros((K,), ch.dtype)])
            padded = jax.vmap(
                lambda s: jax.lax.dynamic_slice(chp, (s,), (K,))
            )(starts[:NZ])
            tot = tot + 1e-38 * jnp.sum(padded)
        return tot
    run_variant("v7_sort_dynslice_perchan", v7, jnp.float32(0))


if "RUN_V6" in os.environ:
    main_v6()
