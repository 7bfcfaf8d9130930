"""Benchmark: multi-species ionization-injection LWFA on one TPU chip.

BASELINE.md benchmark #4 (the reference's ionization example,
docs/source/example_input/ionization_script.py at the standard LWFA
scale): bulk pre-ionized electrons + an N5+ ADK-ionizable dopant whose
stripped electrons land in a separate tracked species.

What it measures vs bench.py (the plain LWFA): the cost of the
elementary-process machinery AND of the dopant/target species falling
off the resident fast path -- species that carry (or are appended into
by) an ionizer stay non-resident because the resident block deposits
before the mid-step appends run (core/step._resident_indices); the
BULK electrons keep the fast path.

Usage: python tools/bench_ionization.py
Prints one JSON line, same schema as bench.py.

Measured (r4, TPU v5e): 134.2 ns/particle/step, 116 ms/step at 864k
particles (bulk 576k resident-fast-path electrons + 288k non-resident
N5+ ions + appended electrons), vs 39.6 ns for the plain LWFA bench --
the delta is the non-resident species' serialized per-index gather +
scatter-path deposits + the ADK/append machinery.  Next lever:
extending residency to process-carrying species (requires appends to
land in the padded layout).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

NZ, NR, NM = 800, 50, 2
ZMAX, ZMIN = 30.e-6, -10.e-6
RMAX = 20.e-6
N_WARMUP, N_STEPS = 5, 40
REFERENCE_TARGET_NS = 1.5


def main():
    import jax
    from fbpic_tpu import Simulation
    from fbpic_tpu.constants import c, e, m_e, m_p
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    dt = (ZMAX - ZMIN) / NZ / c
    sim = Simulation(NZ, ZMAX, NR, RMAX, NM, dt, zmin=ZMIN, n_order=32,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    elec = sim.add_new_species(q=-e, m=m_e, n=4.e24,
                               p_zmin=0., p_zmax=500.e-6,
                               p_rmax=18.e-6, p_nz=2, p_nr=2, p_nt=4)
    ion = sim.add_new_species(q=5 * e, m=14. * m_p, n=1.e23,
                              p_zmin=0., p_zmax=500.e-6,
                              p_rmax=18.e-6, p_nz=2, p_nr=2, p_nt=4)
    # sort_K > 0 on the (initially empty) target species keeps it on
    # the resident fast path: capacity becomes Nz * sort_K and ionized
    # electrons land in dead slots of their own z row (r5)
    elec_from_N = sim.add_new_species(q=-e, m=m_e, sort_K=256)
    ion.make_ionizable("N", target_species=elec_from_N, level_start=5)
    elec_from_N.track(sim.comm)
    add_laser_pulse(sim, GaussianLaser(a0=4., waist=5.e-6,
                                       tau=16.7e-15, z0=-8.e-6))
    sim.set_moving_window(v=c)

    n_par = int(sum((np.asarray(s.w) != 0).sum() for s in sim.state.species))
    resident = [sc.name for sc in sim.species_configs if sc.resident]
    print("resident species:", resident, file=sys.stderr)

    sim.step(N_WARMUP, show_progress=False)
    jax.block_until_ready(sim.state)
    t0 = time.perf_counter()
    sim.step(N_STEPS, show_progress=False)
    jax.block_until_ready(sim.state)
    elapsed = time.perf_counter() - t0

    ms_per_step = elapsed / N_STEPS * 1e3
    ns_pps = elapsed / N_STEPS / max(n_par, 1) * 1e9
    print(json.dumps({
        "metric": "ionization_lwfa_ns_per_particle_step",
        "value": round(ns_pps, 4), "unit": "ns/particle/step",
        "vs_baseline": round(REFERENCE_TARGET_NS / ns_pps, 4),
        "ms_per_step": round(ms_per_step, 3),
        "n_particles": n_par,
        "resident_species": resident,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
