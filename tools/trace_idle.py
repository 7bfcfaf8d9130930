"""Device busy-vs-idle breakdown of the production bench step.

The op-level profiles (profile_ops.py) over-attribute sort spans by
~30x (measured: the banded resort's lax.sort wall-clocks 0.28 ms
standalone but its trace span claims 9.6 ms), so per-op tables cannot
be trusted for sorts.  This tool instead lays every leaf op event on
the device timeline and reports busy time (union of leaf spans),
gap time, and a category breakdown using SPAN times (sorts therefore
upper bounds), plus the wall-per-step for reference.

Usage: python tools/trace_idle.py [n_steps]
"""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24


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
    t0 = time.perf_counter()
    sim.step(N, show_progress=False)
    wall = (time.perf_counter() - t0) / N * 1e3
    print(f"wall: {wall:.2f} ms/step", flush=True)

    tdir = "/tmp/idletrace"
    jax.profiler.start_trace(tdir)
    sim.step(N, show_progress=False)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)

    # identify device-lane PIDs (TensorCore lanes)
    names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "TPU" in n or "/device" in n}

    spans = []
    cats = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category")
        if cat is None:
            continue
        ts, dur = e["ts"], e.get("dur", 0)
        spans.append((ts, ts + dur))
        r = cats.setdefault(cat, [0.0, 0])
        r[0] += dur / 1e3
        r[1] += 1
    if not spans:
        print("no device leaf spans found; pids:", names)
        return
    spans.sort()
    t_lo = spans[0][0]
    t_hi = max(s[1] for s in spans)
    busy = 0.0
    cur_s, cur_e = spans[0]
    for s, e in spans[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    total = (t_hi - t_lo) / 1e3
    busy /= 1e3
    print(f"device timeline: {total/N:.2f} ms/step spanned, "
          f"busy {busy/N:.2f} ms/step, idle {(total-busy)/N:.2f} ms/step")
    print("-- by category (span-summed; sorts inflated ~30x):")
    for k, (d, n) in sorted(cats.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {d/N:8.3f} ms/step x{n//N:4d}  {k}")


if __name__ == "__main__":
    main()
