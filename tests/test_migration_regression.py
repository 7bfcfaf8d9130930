"""Regression: multi-chip migration must never silently lose particles.

Round-2 bug (VERDICT.md "What's weak" #1): migrate_particles truncated
the raw concatenation [from_left, from_right] of the front-packed
receive buffers to min(2*buffer_size, capacity) WITHOUT compacting, so
whenever per-rank capacity < 2*migration_buffer every particle arriving
from the right neighbor (all left-movers -- the entire plasma in a
moving-window run) was silently discarded.  The driver's own production
dryrun (capacity 256, buffer 2048) lost ~264 particles/step.

This test runs that exact configuration and asserts (a) zero counted
overflow and (b) total particle weight parity with the single-chip run.
Reference behavior to match: particle_buffer_handling.py:319-520
(append + reallocate never loses particles).
"""
import numpy as np
import jax
import pytest

from fbpic_tpu.constants import c

N_DEV = 8


def _build_sim():
    from fbpic_tpu import Simulation

    Nz_phys, Nr, Nm = 32, 12, 2
    zmax, zmin, rmax = 4.e-6, -2.e-6, 4.e-6
    dz = (zmax - zmin) / Nz_phys
    sim = Simulation(
        Nz_phys, zmax, Nr, rmax, Nm, dz / c,
        p_zmin=0., p_zmax=50.e-6, p_rmin=0., p_rmax=3.5e-6,
        p_nz=1, p_nr=1, p_nt=4, n_e=1.e24, zmin=zmin,
        n_order=8, boundaries={"z": "open", "r": "reflective"},
        n_damp={"z": 63, "r": 0},   # pads internal Nz to 208 = 8 x 26
        exchange_period=1, random_seed=0, verbose_level=0)
    sim.set_moving_window(v=c)
    return sim


def test_migration_no_silent_loss_small_capacity():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs %d devices" % N_DEV)
    from fbpic_tpu.parallel.api import distribute_simulation

    N_STEPS = 6

    # Single-chip reference for the weight total
    sim1 = _build_sim()
    sim1.step(N_STEPS, show_progress=False)
    w1 = float(np.asarray(sim1.state.species[0].w).sum())

    # Distributed with the round-2 failing sizing: the tiny grid makes
    # the per-rank capacity heuristic produce 256 while the explicit
    # migration_buffer is 2048 (capacity < 2*buffer -- the old
    # truncation precondition).  on_migration_overflow defaults to
    # "error", so any counted loss raises.
    sim8 = _build_sim()
    run = distribute_simulation(sim8, n_devices=N_DEV, n_guard=8,
                                migration_buffer=2048)
    cap_local = run.state.species[0].w.shape[0] // N_DEV
    assert cap_local < 2 * 2048, (
        "test precondition lost: per-rank capacity %d no longer below "
        "2*migration_buffer" % cap_local)
    run.step(N_STEPS)

    assert int(jax.device_get(run.state.migration_overflow)) == 0
    w8 = float(np.asarray(run.state.species[0].w).sum())
    assert w1 > 0
    # Injection/removal schedules are identical (exchange_period=1 both
    # sides); the weight totals must agree to round-off.
    assert abs(w8 - w1) / w1 < 1e-9, (w8, w1)


if __name__ == "__main__":
    test_migration_no_silent_loss_small_capacity()
