"""Radial PML test: a diffracting laser is absorbed, not reflected.

Counterpart of /root/reference/tests/test_pml.py: run a tightly-focused
laser whose diffraction cone hits the radial boundary, with PML and
with a reflective boundary, and verify that the PML strongly reduces
the late-time field energy near the axis (reflections).
"""
import numpy as np
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.constants import c
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

Nz, Nr, Nm = 180, 32, 2
zmax = 18.e-6
rmax = 8.e-6
dt = zmax / Nz / c
# Tightly focused: strong diffraction
a0 = 0.01
waist = 2.0e-6
tau = 6.e-15
z0 = 9.e-6


def _run(boundaries_r, Nr_run, rmax_run, n_steps=400):
    sim = Simulation(Nz, zmax, Nr_run, rmax_run, Nm, dt, n_order=16,
                     boundaries={"z": "periodic", "r": boundaries_r},
                     n_damp={"z": 0, "r": 16},
                     random_seed=0)
    add_laser_pulse(sim, GaussianLaser(a0=a0, waist=waist, tau=tau, z0=z0))
    sim.step(n_steps, correct_currents=False, show_progress=False)
    return {name: sim.get_interp_field(name)
            for name in ("Er", "Et", "Ez")}


def test_pml_absorbs_reflections():
    # Truth: a radially huge box -- reflections never reach the inner
    # region within n_steps
    truth = _run("reflective", 4 * Nr, 4 * rmax)
    pml = _run("open", Nr, rmax)
    refl = _run("reflective", Nr, rmax)

    def inner_error(run):
        err = 0.0
        for name in ("Er", "Et", "Ez"):
            diff = run[name][:, :, :Nr // 3] - truth[name][:, :, :Nr // 3]
            err += float(np.sum(np.abs(diff) ** 2))
        return err

    err_pml = inner_error(pml)
    err_refl = inner_error(refl)
    print(f"inner reflection error: pml={err_pml:.3e} "
          f"reflective={err_refl:.3e} ratio={err_pml / err_refl:.3e}")
    # The PML should reduce the spurious reflected energy by >= 30x
    assert err_pml < err_refl / 30.0


if __name__ == "__main__":
    test_pml_absorbs_reflections()
