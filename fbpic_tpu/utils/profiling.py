"""Tracing / profiling hooks (SURVEY section 5).

The reference profiles with cProfile/nvprof around the step loop; the
TPU-native equivalents are the JAX profiler trace (viewable in
TensorBoard / Perfetto) and simple wall-clock section timers.

Usage::

    from fbpic_tpu.utils.profiling import trace
    with trace("/tmp/fbpic-trace"):
        sim.step(100)
    # then: tensorboard --logdir /tmp/fbpic-trace  (Profile tab), or
    # upload the .trace.json.gz from the plugins/ dir to ui.perfetto.dev

Device-side per-op timing comes from the trace; host-side chunk timing
is printed by ``sim.step(show_progress=True)`` (ms/step with EMA).
"""
import contextlib
import time


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """jax.profiler trace around a code block (TPU + host timelines)."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def section(name, sink=print):
    """Wall-clock timer for a host-side section (blocks on device).

    TPU executes queued programs in order per device, so blocking on a
    freshly enqueued trivial computation drains everything the section
    enqueued before the timer stops."""
    import jax
    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            jax.block_until_ready(jax.device_put(0.0) + 0.0)
        except Exception:
            pass
        sink(f"[fbpic_tpu] {name}: {(time.perf_counter()-t0)*1e3:.2f} ms")
