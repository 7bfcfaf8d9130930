"""Top individual HLO ops of the production bench step (device time).

Like profile_hot.py but attributes by individual op instance name and
prints long_name/shape details, to see exactly which sorts, fusions and
concatenates dominate.  Usage: python tools/profile_ops.py [n_steps]
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
    sim.step(N, show_progress=False)
    import time
    t0 = time.perf_counter()
    sim.step(N, show_progress=False)
    print(f"wall: {(time.perf_counter()-t0)/N*1e3:.2f} ms/step", flush=True)

    tdir = "/tmp/optrace"
    jax.profiler.start_trace(tdir)
    sim.step(N, show_progress=False)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    by_op = {}
    total = 0.0
    for e in data.get("traceEvents", []):
        args = e.get("args", {})
        if e.get("ph") != "X" or "device_duration_ps" not in args:
            continue
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional"):
            continue
        if cat == "" and not args.get("source"):
            continue
        d = int(args["device_duration_ps"]) / 1e9
        total += d
        key = e["name"]
        rec = by_op.setdefault(key, [0.0, 0, args.get("long_name", "")[:300],
                                     cat])
        rec[0] += d
        rec[1] += 1
    print(f"== total attributed device: {total/N:.2f} ms/step")
    print("-- top op instances:")
    for k, (d, n, ln, cat) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"  {d/N:7.3f} ms/step x{n//N:3d}  [{cat}] {k}")
        if ln:
            print(f"           {ln}")


if __name__ == "__main__":
    main()
