"""Mirrors: zero the E/B fields inside a thin z-slab every step.

Behavioral reference: /root/reference/fbpic/lpa_utils/mirrors.py.
The zeroing is diagonal in z and therefore applied together with the
open-boundary damping (in partial-interpolation space).
"""


class Mirror(object):
    """Reflective slab: fields are set to 0 over n_cells starting at z_lab.

    Parameters
    ----------
    z_lab: float -- position of the mirror (lab frame)
    n_cells: int -- thickness of the zeroed slab in cells
    gamma_boost: float or None -- boost of the simulation frame
    m: 'all' or list of modes (mode filtering; 'all' zeroes every mode)
    """

    def __init__(self, z_lab, n_cells=2, gamma_boost=None, m="all"):
        self.z_lab = z_lab
        self.n_cells = n_cells
        self.gamma_boost = gamma_boost
        self.m = m

    def z_boost_and_beta(self):
        """Return (z0, v) such that the mirror is at z0 + v*t in the
        simulation frame."""
        import numpy as np
        from ..constants import c
        if self.gamma_boost is None:
            return self.z_lab, 0.0
        beta0 = np.sqrt(1.0 - 1.0 / self.gamma_boost**2)
        return self.z_lab / self.gamma_boost, -beta0 * c
