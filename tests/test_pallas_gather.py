"""CI parity for the Pallas sorted-gather kernel.

pallas_gather.gather_sorted_pallas is the production TPU default for
the resident-layout field gather (auto-enabled for f32 on TPU).  The
CPU suite would otherwise bypass it (f64 + CPU platform), so this
test forces it through its interpreter mode
(FBPIC_TPU_PALLAS_GATHER=interpret) and checks f32 parity against the
XLA one-hot einsum path (=0) -- covering the corner one-hot wiring,
the signed axis-guard row, the clipped offset/radial edges, the
exp(-i m theta) mode sum and the cylindrical rotation.  The corner
grouping differs from the XLA path at f32 rounding (weights are
applied per corner instead of summed into one S), so the gate is a
few f32 ULPs, not bit-exact.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fbpic_tpu import Simulation
from fbpic_tpu.particles import sorted_deposit as sd
from fbpic_tpu.particles.gather import gather_fields_sorted


def _run(mode, zfold, seed=31):
    rng = np.random.RandomState(seed)
    Nz, Nr, Nm = 32, 12, 2
    dz, dr, zmin = 0.1, 0.2, -1.0
    sim = Simulation(Nz, zmin + Nz * dz, Nr, Nr * dr, Nm, 1e-12,
                     zmin=zmin, verbose_level=0)
    f32 = np.float32
    interp = sim.state.interp
    # Non-trivial fields in every mode/component
    import dataclasses
    from fbpic_tpu.utils.complex_arr import CArr
    upd = {}
    for fname in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
        re = rng.randn(Nm, Nz, Nr)
        im = rng.randn(Nm, Nz, Nr)
        upd[fname] = CArr(jnp.asarray(re.astype(f32)),
                          jnp.asarray(im.astype(f32)))
    interp = dataclasses.replace(interp, **upd)

    Np = 3000
    z = zmin + rng.uniform(-0.1, Nz * dz + 0.1, Np)
    # heavy near-axis population so the signed guard row is exercised
    r = np.where(rng.rand(Np) < 0.4,
                 rng.uniform(0, 1.2 * dr, Np),
                 rng.uniform(0, Nr * dr * 1.02, Np))
    th = rng.uniform(0, 2 * np.pi, Np)
    x, y = r * np.cos(th), r * np.sin(th)
    w = rng.uniform(0.5, 1.5, Np)
    w[rng.rand(Np) < 0.1] = 0.0
    xj, yj, zj, wj = (jnp.asarray(a.astype(f32)) for a in (x, y, z, w))
    sort = sd.build_column_sort(zj, wj, zmin, 1 / dz, Nz, K=384)
    xp, yp, zp = sd._padded_arrays(sort, [xj, yj, zj])
    valid = sort["valid"]

    old = os.environ.get("FBPIC_TPU_PALLAS_GATHER")
    os.environ["FBPIC_TPU_PALLAS_GATHER"] = mode
    try:
        out = gather_fields_sorted(
            xp, yp, zp, valid, interp, np.float32(Nr * dr),
            1 / dz, zmin, Nz, 1 / dr, 0.0, Nr, zfold=zfold)
    finally:
        if old is None:
            del os.environ["FBPIC_TPU_PALLAS_GATHER"]
        else:
            os.environ["FBPIC_TPU_PALLAS_GATHER"] = old
    return out, np.asarray(valid)


@pytest.mark.quick
@pytest.mark.parametrize("zfold", ["periodic", "clamp"])
def test_pallas_gather_interpret_matches_xla(zfold):
    ref, valid = _run("0", zfold)
    pal, _ = _run("interpret", zfold)
    names = ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
    for name, a, b in zip(names, ref, pal):
        a = np.asarray(a)[valid]
        b = np.asarray(b)[valid]
        scale = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max()
        assert err <= 5e-6 * scale, (name, err / scale)


if __name__ == "__main__":
    test_pallas_gather_interpret_matches_xla("periodic")
    test_pallas_gather_interpret_matches_xla("clamp")
