"""Device detection and memory helpers (the reference's cuda.py analog).

Reference: /root/reference/fbpic/utils/cuda.py -- device probing, model
detection, per-rank device binding, OOM handling.  On TPU/JAX, device
binding is handled by the runtime; this module exposes introspection
plus a friendly-OOM decorator.
"""
import functools

import jax


def tpu_installed():
    """Whether a TPU (or other accelerator) backend is available."""
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def device_kind():
    """e.g. 'TPU v5 lite' or 'cpu'."""
    return jax.devices()[0].device_kind


def local_device_count():
    return jax.local_device_count()


def memory_stats():
    """Per-device memory statistics, when the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats


def catch_memory_error(fn):
    """Convert backend OOM errors into an actionable message
    (reference: printing.py:313-345)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as err:
            message = str(err)
            if "RESOURCE_EXHAUSTED" in message or "Out of memory" in message:
                raise MemoryError(
                    "The device ran out of memory.\n"
                    "Try reducing the grid size, the number of "
                    "macroparticles, or the particle-buffer capacities "
                    "(`capacity` argument of add_new_species).\n"
                    "Original error:\n" + message)
            raise

    return wrapper
