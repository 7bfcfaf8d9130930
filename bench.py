"""Benchmark: per-step cost of the PIC cycle on the standard LWFA-scale grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's standard LWFA benchmark scale
(docs/source/example_input/lwfa_script.py: Nz=800, Nr=50, Nm=2,
16 particles/cell).  `vs_baseline` is (reference_target / measured)
where the target is 1.5 ns/particle/step -- the scale of CUDA FBPIC on
a V100-class GPU for this workload (the reference publishes no absolute
numbers; see BASELINE.md).  >1.0 means faster than the target.
"""
import json
import time

import numpy as np

REFERENCE_TARGET_NS = 1.5  # ns/particle/step, CUDA-FBPIC-on-V100 scale

# Benchmark scale (LWFA standard)
NZ, NR, NM = 800, 50, 2
P_NZ, P_NR, P_NT = 2, 2, 4       # 16 particles per cell
N_WARMUP = 3
N_STEPS = 30


def main():
    import jax
    from fbpic_tpu import Simulation
    from fbpic_tpu.constants import c

    zmax = NZ * 0.05e-6
    rmax = NR * 0.4e-6
    dt = zmax / NZ / c

    sim = Simulation(
        NZ, zmax, NR, rmax, NM, dt,
        p_zmin=0.0, p_zmax=zmax, p_rmin=0.0, p_rmax=0.9 * rmax,
        p_nz=P_NZ, p_nr=P_NR, p_nt=P_NT, n_e=2.0e24,
        n_order=32, random_seed=0,
    )
    n_particles = sim.ptcl[0].Ntot

    # Warmup (jit compile)
    sim.step(N_WARMUP, show_progress=False)

    t0 = time.perf_counter()
    sim.step(N_STEPS, show_progress=False)
    t1 = time.perf_counter()

    wall = t1 - t0
    # step() includes a fresh rho_prev deposit + E/B re-transform per
    # call; that is once per call, not per step, so amortized over N_STEPS.
    ns_per_particle_step = wall * 1e9 / (N_STEPS * n_particles)
    steps_per_sec = N_STEPS / wall

    result = {
        "metric": "lwfa_scale_ns_per_particle_step",
        "value": round(ns_per_particle_step, 4),
        "unit": "ns/particle/step",
        "vs_baseline": round(REFERENCE_TARGET_NS / ns_per_particle_step, 4),
        "steps_per_sec": round(steps_per_sec, 3),
        "n_particles": int(n_particles),
        "grid": [NZ, NR, NM],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
