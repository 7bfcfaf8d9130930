"""Golden-profile + invariant regression gates for the laser wakefield.

The flagship LWFA test compares against an ANALYTIC model with ~19%
tolerance (finite-waist model error), which could absorb a sizeable
regression in the deposition/injection/exchange machinery.  This file
pins a small production-configuration run (open z + moving window +
continuous injection, laser driver) two ways:

1. CPU (f64): exact 450-step profile vs a stored golden at 2e-3 --
   f64 is reordering-insensitive at this scale, so the pin survives
   perf work untouched.

2. TPU (FBPIC_TPU_TEST_ON_TPU=1, f32): a two-tier gate designed to
   survive summation-order changes (VERDICT r4: ANY reordering -- a
   new kernel, a fusion change -- moves a 450-step f32 wake by 3-6%,
   so a long-horizon exact pin can never stay green across perf work):

   a. EXACT pin at 100 steps.  Measured on-chip reordering floor
      (Pallas deposit on vs off, r5 session): Ez 8e-4, rho 3e-3 at
      100 steps.  Gates of 1.5e-2 (fields) / 3e-2 (rho) sit ~10x
      above that floor and far below any real physics regression.
   b. INVARIANT gates at 450 steps: wake wavelength from the Ez
      zero crossings (vs both the analytic plasma wavelength and the
      golden-recorded value), wake amplitude band, bounded field
      energy, no NaNs.  These are reordering-robust by construction.

REGEN POLICY.  Regenerate with
    FBPIC_TPU_REGEN_GOLDEN=1 [FBPIC_TPU_TEST_ON_TPU=1] \
        python -m pytest tests/test_golden_wake.py
and justify in the commit message:
- CPU golden: after any INTENDED physics-affecting change.
- TPU golden: after an intended physics change, OR when a
  numerics-reordering commit moves the 100-step profile past the
  gate (should be rare: the floor is ~10x below it).  The invariant
  gates (b) survive reordering and only need regen on intended
  physics changes.
Goldens embed provenance (commit, device, jax version, timestamp):
inspect with np.load(...)["provenance"].
"""
import os
import subprocess

import numpy as np

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c, e, m_e
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_wake.npz")
GOLDEN_TPU = os.path.join(os.path.dirname(__file__), "data",
                          "golden_wake_tpu.npz")
ON_TPU = bool(os.environ.get("FBPIC_TPU_TEST_ON_TPU"))

N_E = 4.e24
N_PIN, N_FULL = 100, 450


def _capture(sim):
    Ez = np.asarray(sim.get_interp_field("Ez", 0).real)
    Er0 = np.asarray(sim.get_interp_field("Er", 0).real)
    Er1 = np.abs(np.asarray(sim.get_interp_field("Er", 1)))
    rho = np.asarray(sim.get_interp_field("rho", 0).real)
    return dict(Ez_axis=Ez[:, 0], Er0_r5=Er0[:, 5], Er1_r5=Er1[:, 5],
                rho_axis=rho[:, 0])


def _run():
    Nz, Nr, Nm = 400, 24, 2
    zmax, zmin, rmax = 30.e-6, -10.e-6, 20.e-6
    dt = (zmax - zmin) / Nz / c
    # The laser starts near the RIGHT edge of the box (plasma begins
    # just ahead of it) so the wake trail behind it fills the whole
    # moving window -- the wavelength invariant needs >= 3 zero
    # crossings (the old config kept only ~half a period in the box).
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin=24.e-6, p_zmax=500.e-6, p_rmin=0.,
                     p_rmax=14.e-6, p_nz=1, p_nr=1, p_nt=4, n_e=N_E,
                     zmin=zmin, n_order=32,
                     boundaries={"z": "open", "r": "reflective"},
                     random_seed=0, verbose_level=0)
    add_laser_pulse(sim, GaussianLaser(a0=1.0, waist=8.e-6,
                                       tau=10.e-15, z0=20.e-6))
    sim.set_moving_window(v=c)
    sim.step(N_PIN, show_progress=False)
    pin = _capture(sim)
    sim.step(N_FULL - N_PIN, show_progress=False)
    full = _capture(sim)
    dz = (zmax - zmin) / Nz
    return pin, full, dz


def _wake_wavelength(Ez_axis, dz):
    """Plasma wavelength from the alternating zero crossings of the
    on-axis Ez (linearly interpolated): successive crossings of a
    sinusoid are half a period apart.  Crossings qualify only when the
    preceding lobe is a significant fraction of the wake amplitude
    (kills the quiet region ahead of the laser and startup noise)."""
    E = np.asarray(Ez_axis, np.float64)
    amp = np.abs(E).max()
    flips = np.flatnonzero(np.sign(E[:-1]) * np.sign(E[1:]) < 0)
    keep = [i for i in flips
            if np.abs(E[max(0, i - 40):i + 1]).max() > 0.25 * amp]
    if len(keep) < 3:
        return None
    keep = np.asarray(keep)
    # sub-cell position of each crossing
    zc = keep + E[keep] / (E[keep] - E[keep + 1])
    return float(2.0 * np.diff(zc).mean() * dz)


def _provenance():
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(__file__)),
            capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    import jax
    import datetime
    dev = str(jax.devices()[0])
    env = {k: v for k, v in os.environ.items()
           if k.startswith(("FBPIC_TPU", "JAX_", "XLA_"))}
    return np.asarray(
        f"commit={commit} device={dev} jax={jax.__version__} "
        f"x64={jax.config.jax_enable_x64} "
        f"date={datetime.datetime.now().isoformat()} env={env}")


def test_wake_matches_golden():
    pin, full, dz = _run()
    golden = GOLDEN_TPU if ON_TPU else GOLDEN
    lam = _wake_wavelength(full["Ez_axis"], dz)
    assert lam is not None, "no wake oscillation found"
    amp = float(np.abs(full["Ez_axis"]).max())
    if os.environ.get("FBPIC_TPU_REGEN_GOLDEN"):
        payload = {f"pin_{k}": v.astype(np.float32)
                   for k, v in pin.items()}
        payload.update({f"full_{k}": v.astype(np.float32)
                        for k, v in full.items()})
        payload["inv_wavelength"] = np.float64(lam)
        payload["inv_amplitude"] = np.float64(amp)
        payload["provenance"] = _provenance()
        np.savez_compressed(golden, **payload)
        raise RuntimeError(f"golden regenerated at {golden}; rerun "
                           "without FBPIC_TPU_REGEN_GOLDEN")
    gold = np.load(golden)

    # -- sanity / boundedness (both platforms)
    for name, arr in full.items():
        assert np.isfinite(arr).all(), f"{name} has non-finite values"

    # -- exact pin
    if ON_TPU:
        horizon, gates = "pin", {"Ez_axis": 1.5e-2, "Er0_r5": 1.5e-2,
                                 "Er1_r5": 1.5e-2, "rho_axis": 3e-2}
        prof = pin
    else:
        horizon, gates = "full", {k: 2e-3 for k in full}
        prof = full
    for name, arr in prof.items():
        g = gold[f"{horizon}_{name}"]
        scale = np.abs(g).max()
        err = np.abs(arr - g).max()
        assert err < gates[name] * scale, (name, err / scale)

    # -- invariants at 450 steps (reordering-robust)
    eps0 = 8.8541878128e-12
    wp = np.sqrt(N_E * e**2 / (m_e * eps0))
    lam_analytic = 2 * np.pi * c / wp
    # a0=1 is mildly nonlinear: measured wavelength within 15% of the
    # linear analytic value, and within 2% of the golden-recorded one
    assert abs(lam / lam_analytic - 1) < 0.15, (lam, lam_analytic)
    assert abs(lam / float(gold["inv_wavelength"]) - 1) < 0.02
    # amplitude band: 10% of the recorded wake amplitude
    assert 0.9 < amp / float(gold["inv_amplitude"]) < 1.1
    # field energy bounded: the profile's rms must not blow up
    rms = float(np.sqrt(np.mean(full["Ez_axis"] ** 2)))
    g_rms = float(np.sqrt(np.mean(gold["full_Ez_axis"] ** 2)))
    assert rms < 2.0 * g_rms
