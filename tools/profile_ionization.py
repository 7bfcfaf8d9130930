"""Top HLO ops of the ionization LWFA bench step (device time).

Same attribution as profile_ops.py, on the bench_ionization.py
workload (3 resident species incl. the ADK ionizer + its target).
Usage: python tools/profile_ionization.py [n_steps]
"""
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12


def main():
    import jax
    from fbpic_tpu import Simulation
    from fbpic_tpu.constants import c, e, m_e, m_p
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    NZ, NR, NM = 800, 50, 2
    dt = 40.e-6 / NZ / c
    sim = Simulation(NZ, 30.e-6, NR, 20.e-6, NM, dt, zmin=-10.e-6,
                     n_order=32,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    sim.add_new_species(q=-e, m=m_e, n=4.e24, p_zmin=0., p_zmax=500.e-6,
                        p_rmax=18.e-6, p_nz=2, p_nr=2, p_nt=4)
    ion = sim.add_new_species(q=5 * e, m=14. * m_p, n=1.e23,
                              p_zmin=0., p_zmax=500.e-6,
                              p_rmax=18.e-6, p_nz=2, p_nr=2, p_nt=4)
    elec_from_N = sim.add_new_species(q=-e, m=m_e, sort_K=256)
    ion.make_ionizable("N", target_species=elec_from_N, level_start=5)
    elec_from_N.track(sim.comm)
    add_laser_pulse(sim, GaussianLaser(a0=4., waist=5.e-6,
                                       tau=16.7e-15, z0=-8.e-6))
    sim.set_moving_window(v=c)
    print("resident:", [sc.name for sc in sim.species_configs
                        if sc.resident],
          "sort_K:", [sc.sort_K for sc in sim.species_configs])
    sim.step(N, show_progress=False)
    import time
    t0 = time.perf_counter()
    sim.step(N, show_progress=False)
    print(f"wall: {(time.perf_counter()-t0)/N*1e3:.2f} ms/step",
          flush=True)

    tdir = "/tmp/iontrace"
    jax.profiler.start_trace(tdir)
    sim.step(N, show_progress=False)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    by_op = {}
    total = 0.0
    for ev in data.get("traceEvents", []):
        args = ev.get("args", {})
        if ev.get("ph") != "X" or "device_duration_ps" not in args:
            continue
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional"):
            continue
        if cat == "" and not args.get("source"):
            continue
        d = int(args["device_duration_ps"]) / 1e9
        total += d
        key = ev["name"]
        rec = by_op.setdefault(key, [0.0, 0,
                                     args.get("long_name", "")[:240],
                                     cat])
        rec[0] += d
        rec[1] += 1
    print(f"== total attributed device: {total/N:.2f} ms/step")
    print("-- top op instances:")
    for k, (d, n, ln, cat) in sorted(by_op.items(),
                                     key=lambda kv: -kv[1][0])[:30]:
        print(f"  {d/N:7.3f} ms/step x{n//N:3d}  [{cat}] {k}")
        if ln:
            print(f"           {ln}")


if __name__ == "__main__":
    main()
