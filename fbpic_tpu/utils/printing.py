"""Progress bar and setup banner.

Behavioral reference: /root/reference/fbpic/utils/printing.py -- live
ms/step with EMA + ETA, first step reported as compilation time.
"""
import sys
import time

import numpy as np

from .. import __version__


class ProgressBar(object):
    """Shows a progress bar with steps/s, EMA step time and ETA."""

    def __init__(self, N, n_avg=20, Nbars=35):
        self.N = N
        self.i_step = 0
        self.Nbars = Nbars
        self.avg_timeper_step = 0.0
        self.n_avg = n_avg
        self.init_time = time.time()
        self.prev_time = self.init_time

    def time(self, i_step):
        curr_time = time.time()
        time_per_step = curr_time - self.prev_time
        self.prev_time = curr_time
        self.i_step = i_step
        if i_step > 1:
            # Exponential moving average (step 0/1 excluded: compilation)
            alpha = min(1.0 / self.n_avg, 1.0 / max(i_step - 1, 1))
            self.avg_timeper_step = (
                (1 - alpha) * self.avg_timeper_step + alpha * time_per_step)
        elif i_step == 1:
            self.avg_timeper_step = time_per_step

    def print_progress(self):
        i = self.i_step
        nbars = int(i * self.Nbars / max(self.N, 1))
        bar = "|" + nbars * "-" + (self.Nbars - nbars) * " " + "|"
        if i <= 1:
            info = " (compiling)"
        else:
            eta = self.avg_timeper_step * (self.N - i)
            info = " %d/%d, %.1f ms/step, ETA %s" % (
                i, self.N, 1e3 * self.avg_timeper_step,
                time.strftime("%H:%M:%S", time.gmtime(eta)))
        sys.stdout.write("\r" + bar + info + " " * 8)
        sys.stdout.flush()

    def print_summary(self):
        total = time.time() - self.init_time
        sys.stdout.write(
            "\nTotal duration: %.1f s; average %.1f ms/step "
            "(first steps include jit compilation)\n"
            % (total, 1e3 * self.avg_timeper_step))
        sys.stdout.flush()


def print_simulation_setup(sim, verbose_level=1):
    """Print a setup banner (reference: printing.py:139-243)."""
    if verbose_level <= 0:
        return
    import jax
    cfg = sim.config
    lines = [
        "fbpic_tpu %s" % __version__,
        "Device(s): %s" % ", ".join(str(d) for d in jax.devices()),
        "Grid: Nz=%d (physical %d) x Nr=%d, Nm=%d modes" % (
            cfg.Nz, sim.Nz_phys, cfg.Nr, cfg.Nm),
        "dz=%.3e m, dr=%.3e m, dt=%.3e s, stencil order n=%d" % (
            cfg.dz, cfg.dr, cfg.dt, cfg.n_order),
        "Boundaries: z=%s, r=%s" % (
            cfg.boundaries_z, "open (PML)" if cfg.use_pml
            else "reflective"),
    ]
    if verbose_level >= 2:
        for i, sc in enumerate(sim.species_configs):
            lines.append("Species %d (%s): q=%.3e C, m=%.3e kg" % (
                i, sc.name, sc.q, sc.m))
    print("\n".join(lines))
