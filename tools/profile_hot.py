"""Trace the production bench step and attribute device time by source.

Runs a few bench-config steps under jax.profiler, aggregates XLA op
device_duration_ps by the `source` (file:line) each op's HLO metadata
points at.  Usage: python tools/profile_hot.py [n_steps]
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
    from fbpic_tpu.constants import c
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    NZ, NR, NM = 800, 50, 2
    dt = 40.e-6 / NZ / c
    sim = Simulation(NZ, 30.e-6, NR, 20.e-6, NM, dt,
                     p_zmin=0., p_zmax=500.e-6, p_rmin=0., p_rmax=18.e-6,
                     p_nz=2, p_nr=2, p_nt=4, n_e=4.e24, zmin=-10.e-6,
                     n_order=32, boundaries={"z": "open", "r": "reflective"},
                     random_seed=0)
    add_laser_pulse(sim, GaussianLaser(a0=4.0, waist=5.e-6, tau=16.7e-15,
                                       z0=-8.e-6))
    sim.set_moving_window(v=c)
    sim.step(N, show_progress=False)      # warm both chunk sizes
    import time
    t0 = time.perf_counter()
    sim.step(N, show_progress=False)
    print(f"wall: {(time.perf_counter()-t0)/N*1e3:.2f} ms/step", flush=True)

    tdir = "/tmp/hotrace"
    jax.profiler.start_trace(tdir)
    sim.step(N, show_progress=False)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    by_src = {}
    by_name = {}
    total = 0.0
    for e in data.get("traceEvents", []):
        args = e.get("args", {})
        if e.get("ph") != "X" or "device_duration_ps" not in args:
            continue
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional", ""):     # containers double-count
            if not args.get("source"):
                continue
            if cat in ("while", "conditional"):
                continue
        d = int(args["device_duration_ps"]) / 1e9
        total += d
        src = args.get("source", "?")
        by_src[src] = by_src.get(src, 0.0) + d
        by_name[e["name"].split(".")[0]] = \
            by_name.get(e["name"].split(".")[0], 0.0) + d
    print(f"== total attributed device: {total/N:.2f} ms/step")
    print("-- by source line:")
    for s, d in sorted(by_src.items(), key=lambda kv: -kv[1])[:22]:
        print(f"  {d/N:7.3f} ms/step  {s}")
    print("-- by op class:")
    for s, d in sorted(by_name.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {d/N:7.3f} ms/step  {s}")


if __name__ == "__main__":
    main()
