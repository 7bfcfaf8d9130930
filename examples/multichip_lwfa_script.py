"""Multi-chip LWFA: the same simulation z-decomposed over a TPU mesh.

fbpic_tpu's analog of the reference's `mpirun -np N` mode: the z axis
is slab-decomposed over the devices of a jax.sharding.Mesh with
ppermute guard-cell exchange over ICI and fixed-capacity particle
migration -- no MPI, one process.

Run on a multi-chip host:  python multichip_lwfa_script.py
Test without hardware:     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                           JAX_PLATFORMS=cpu python multichip_lwfa_script.py
"""
from scipy.constants import c

from fbpic_tpu import Simulation
from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser
from fbpic_tpu.parallel.api import distribute_simulation
from fbpic_tpu.diagnostics import FieldDiagnostic, ParticleDiagnostic

Nz, zmax, zmin = 800, 30.e-6, -10.e-6
Nr, rmax, Nm = 50, 20.e-6, 2
dt = (zmax - zmin) / Nz / c


# Smoke-test mode (used by tests/test_examples.py): tiny grid, few steps
import os
_SMOKE = bool(os.environ.get("FBPIC_TPU_EXAMPLE_SMOKE"))

N_step = 2000
N_ORDER, PPC, DIAG = 32, (2, 2, 4), 100
if _SMOKE:
    Nz, Nr, Nm, N_ORDER = 160, 12, 2, 8
    dt = (zmax - zmin) / Nz / c
    PPC, DIAG, N_step = (1, 1, 4), 4, 6

if __name__ == "__main__":
    sim = Simulation(Nz, zmax, Nr, rmax, Nm, dt,
                     p_zmin=0.e-6, p_zmax=500.e-6, p_rmin=0.,
                     p_rmax=18.e-6, p_nz=PPC[0], p_nr=PPC[1], p_nt=PPC[2],
                     n_e=4.e24,
                     zmin=zmin, n_order=N_ORDER,
                     boundaries={'z': 'open', 'r': 'reflective'})
    add_laser_pulse(sim, GaussianLaser(a0=4., waist=5.e-6,
                                       tau=16.7e-15, z0=-8.e-6))
    sim.set_moving_window(v=c)
    sim.diags = [FieldDiagnostic(DIAG, sim.fld, comm=sim.comm)]

    # Decompose AFTER full setup; diagnostics/checkpoints keep working
    run = distribute_simulation(sim)
    run.step(N_step)
