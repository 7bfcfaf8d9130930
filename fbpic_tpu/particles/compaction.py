"""Front-pack a masked subset of particle arrays into a small buffer.

TPU-native compaction: a scatter of N updates serializes on TPU
(~4-6 ns/update measured; XLA lowers scatter row-serially), so the
obvious ``buf.at[cumsum(mask)].set(...)`` costs ~6 ms per channel at
the padded-layout N ~ 1.3e6 -- and every extra payload channel pays it
again.  ``lax.top_k`` over an int32 score followed by per-channel
gathers of ``buffer_size`` elements does the same job in ~1 ms total:
one partial-sort pass, then tiny gathers.

Score ``N - i`` for selected elements (0 otherwise) makes top_k return
the selected indices in ASCENDING index order (ties at score 0 are
masked out), i.e. the packing order is identical to the cumsum scatter
it replaces -- downstream id assignment and slot layout are unchanged.

Used by ionization (per-step, the hot path), Compton and migration
buffers.  Reference analog: the CUDA prefix-sum compaction in
fbpic/particles/elementary_process/cuda_numba_utils.py:60-120.
"""
import jax
import jax.numpy as jnp


def topk_compact(mask, buffer_size, arrays):
    """Pack ``arrays[name][mask]`` (in index order) into
    ``(buffer_size,)`` buffers, zero-filled past the selection.

    Parameters
    ----------
    mask: bool (N,) -- which elements to keep
    buffer_size: static int -- output buffer length
    arrays: dict name -> (N,) array (any dtype; fill value is 0)

    Returns (bufs, n_selected, n_taken): dict of (buffer_size,) arrays,
    the total selected count, and the count that fit in the buffer
    (selected beyond ``buffer_size`` are dropped, exactly like the
    cumsum-scatter pattern this replaces).
    """
    N = mask.shape[0]
    k = min(buffer_size, N)
    score = jnp.where(mask, jnp.int32(N) - jnp.arange(N, dtype=jnp.int32),
                      0)
    got_score, idxs = jax.lax.top_k(score, k)
    got = got_score > 0

    bufs = {}
    for name, arr in arrays.items():
        zero = jnp.zeros((), arr.dtype)
        buf = jnp.where(got, arr[idxs], zero)
        if k < buffer_size:
            buf = jnp.pad(buf, (0, buffer_size - k))
        bufs[name] = buf
    n_selected = jnp.sum(mask.astype(jnp.int32))
    n_taken = jnp.sum(got.astype(jnp.int32))
    return bufs, n_selected, n_taken
