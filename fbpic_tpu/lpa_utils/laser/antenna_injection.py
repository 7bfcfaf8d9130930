"""Laser emission by a virtual antenna plane.

A laser can be progressively emitted from a plane z = z0(t) carrying
the surface current K = 2 eps0 c E_laser (the field a current sheet
must carry to radiate E_laser symmetrically; the reference implements
this with virtual macroparticle pairs whose motion produces exactly
this current -- antenna_injection.py:24-330).

TPU-native redesign: rather than pushing virtual particles through the
deposition kernels each step, the azimuthally-decomposed (Jr, Jt) the
antenna must add to the grid is precomputed on the host for each chunk
of steps (the laser profile is an analytic function of space and time)
and shipped to the device as a (n_steps, Nm, Nr) time series; inside
the jit step the current slice is added onto the two z cells adjacent
to the antenna with linear weights.  This is exact for prescribed
(non-back-reacting) antennas, which is what the reference implements.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ...constants import c, epsilon_0
from ...utils.pytree import pytree_dataclass
from ...utils.dtypes import real_dtype
from ...utils.complex_arr import CArr


@pytree_dataclass
class AntennaSeries:
    """Device time series of the antenna's deposited current.

    Jr/Jt: CArr (n_steps, Nm, Nr) -- mode-decomposed current densities
    (already divided by dz: surface current / cell size).
    z_pos: (n_steps,) -- antenna z position at each step
    it0: int32 scalar -- iteration of the first slice
    """
    Jr: CArr
    Jt: CArr
    z_pos: jax.Array
    it0: jax.Array


class LaserAntenna(object):
    """Virtual antenna emitting a given laser profile.

    Parameters mirror the reference (antenna_injection.py:24-120).
    """

    def __init__(self, laser_profile, z0_antenna, v_antenna,
                 z_grid, r_grid, dr, dt, Nm, boost=None):
        self.profile = laser_profile
        self.z0 = z0_antenna
        self.v = v_antenna
        self.boost = boost
        self.dt = dt
        self.Nm = Nm
        self.r = np.asarray(r_grid)
        self.dr = dr
        if boost is not None and v_antenna == 0.0:
            # A lab-static antenna moves backward in the boosted frame
            self.z0 = z0_antenna / boost.gamma0
            self.v = -boost.beta0 * c

    def compute_series(self, t0, n_steps, dz):
        """Host-side evaluation of the emitted current for n_steps steps.

        The current is sampled at the half-steps t0 + (i + 1/2) dt, the
        time at which J is deposited in the PIC cycle.
        """
        Nm = self.Nm
        ntheta = 2 * Nm
        theta = (2 * np.pi / ntheta) * np.arange(ntheta)
        r3, th3 = np.meshgrid(self.r, theta, indexing="ij")
        x2 = r3 * np.cos(th3)
        y2 = r3 * np.sin(th3)

        Jr = np.zeros((n_steps, Nm, len(self.r)), complex)
        Jt = np.zeros_like(Jr)
        z_pos = np.zeros(n_steps)
        for i in range(n_steps):
            t = t0 + (i + 0.5) * self.dt
            z_ant = self.z0 + self.v * t
            z_pos[i] = z_ant
            if self.boost is not None:
                zlab = self.boost.gamma0 * (
                    z_ant + self.boost.beta0 * c * t)
                tlab = self.boost.gamma0 * (
                    t + self.boost.beta0 * z_ant / c)
                Ex, Ey = self.profile.E_field(
                    x2, y2, np.full_like(x2, zlab), tlab)
                scale = 1.0 / (self.boost.gamma0 * (1 + self.boost.beta0))
                Ex = Ex * scale
                Ey = Ey * scale
            else:
                Ex, Ey = self.profile.E_field(
                    x2, y2, np.full_like(x2, z_ant), t)
            Er = np.cos(th3) * Ex + np.sin(th3) * Ey
            Et = -np.sin(th3) * Ex + np.cos(th3) * Ey
            # Azimuthal decomposition + surface current / dz
            coef = 2 * epsilon_0 * c / dz
            Jr[i] = coef * np.moveaxis(
                np.fft.ifft(Er, axis=-1)[:, :Nm], -1, 0)
            Jt[i] = coef * np.moveaxis(
                np.fft.ifft(Et, axis=-1)[:, :Nm], -1, 0)

        rdt = real_dtype()
        return AntennaSeries(
            Jr=CArr.from_numpy(Jr, rdt),
            Jt=CArr.from_numpy(Jt, rdt),
            z_pos=jnp.asarray(z_pos, rdt),
            it0=jnp.asarray(0, jnp.int32),  # set by the caller
        )


def add_antenna_current(Jr_grid, Jt_grid, series: AntennaSeries,
                        iteration, zmin, dz, Nz, own_bounds=None):
    """Add the antenna's current slice onto the grid (inside jit).

    Linear weights between the two z cells adjacent to the antenna.
    `own_bounds`: on a z-decomposed mesh, the (z_lo, z_hi) interval this
    rank owns -- the antenna deposits only on its owning rank (spill
    into guard cells is guard-added to the neighbor, like particles).
    """
    i = iteration - series.it0
    i = jnp.clip(i, 0, series.z_pos.shape[0] - 1)
    Jr_slice = series.Jr[i]       # CArr (Nm, Nr)
    Jt_slice = series.Jt[i]
    z_ant = series.z_pos[i]

    z_cell = (z_ant - zmin) / dz - 0.5
    iz0 = jnp.floor(z_cell).astype(jnp.int32)
    s1 = z_cell - iz0.astype(z_cell.dtype)
    s0 = 1.0 - s1
    iz0c = jnp.clip(iz0, 0, Nz - 1)
    iz1c = jnp.clip(iz0 + 1, 0, Nz - 1)
    in_box = (iz0 >= 0) & (iz0 < Nz - 1)
    if own_bounds is not None:
        in_box = in_box & (z_ant >= own_bounds[0]) \
            & (z_ant < own_bounds[1])
    s0 = jnp.where(in_box, s0, 0.0)
    s1 = jnp.where(in_box, s1, 0.0)

    def add(G, S):
        re = G.re.at[:, iz0c, :].add(s0 * S.re)
        re = re.at[:, iz1c, :].add(s1 * S.re)
        im = G.im.at[:, iz0c, :].add(s0 * S.im)
        im = im.at[:, iz1c, :].add(s1 * S.im)
        return CArr(re, im)

    return add(Jr_grid, Jr_slice), add(Jt_grid, Jt_slice)
