"""openPMD HDF5 diagnostics: common file/iteration layout.

Writes openPMD-1.0.0-compliant file-based series
(`diags/hdf5/data%08d.h5`), readable by openPMD-viewer.
Behavioral reference: /root/reference/fbpic/openpmd_diag/generic_diag.py.
"""
import os
import datetime

import numpy as np

from .data_dict import (unit_dimension_dict, macro_weighted_dict,
                        weighting_power_dict)
from .. import __version__


def _s(text):
    """Fixed-length bytes string for HDF5 attrs."""
    return np.bytes_(text)


class OpenPMDDiagnostic(object):
    """Base class for the openPMD diagnostics."""

    def __init__(self, period=None, comm=None, write_dir=None,
                 iteration_min=0, iteration_max=np.inf,
                 dt_period=None, dt_sim=None):
        self.rank = 0 if comm is None else getattr(comm, "rank", 0)

        if period is None and dt_period is None:
            raise ValueError(
                "You need to pass either `period` or `dt_period` "
                "to the diagnostics.")
        if period is not None and dt_period is not None:
            raise ValueError(
                "Pass either `period` or `dt_period`, not both.")
        if period is None:
            period = dt_period / dt_sim
        self.period = max(1, int(round(period)))

        self.iteration_min = iteration_min
        self.iteration_max = iteration_max
        self.comm = comm

        if write_dir is None:
            self.write_dir = os.path.join(os.getcwd(), "diags")
        else:
            self.write_dir = os.path.abspath(write_dir)
        if self.rank == 0:
            os.makedirs(os.path.join(self.write_dir, "hdf5"), exist_ok=True)

    # -----------------------------------------------------------------
    def write(self, sim):
        """Write the data if the current iteration matches the period.

        `sim` may be a Simulation object (preferred) or an int iteration
        for reference-style calls.
        """
        iteration = sim if isinstance(sim, int) else sim.iteration
        if (iteration % self.period == 0
                and iteration >= self.iteration_min
                and iteration < self.iteration_max):
            self.write_hdf5(sim, iteration)

    def write_hdf5(self, sim, iteration):
        raise NotImplementedError

    # -----------------------------------------------------------------
    def open_file(self, fullpath):
        import h5py
        if self.rank == 0:
            return h5py.File(fullpath, mode="a")
        return None

    def setup_openpmd_file(self, f, iteration, time, dt):
        f.attrs["openPMD"] = _s("1.0.0")
        f.attrs["openPMDextension"] = np.uint32(1)
        f.attrs["software"] = _s("fbpic_tpu " + __version__)
        f.attrs["date"] = _s(
            datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S %z"))
        f.attrs["meshesPath"] = _s("fields/")
        f.attrs["particlesPath"] = _s("particles/")
        f.attrs["iterationEncoding"] = _s("fileBased")
        f.attrs["iterationFormat"] = _s("data%T.h5")
        f.attrs["basePath"] = _s("/data/%T/")
        bp = f.require_group("/data/%d/" % iteration)
        bp.attrs["time"] = time
        bp.attrs["dt"] = dt
        bp.attrs["timeUnitSI"] = 1.0

    def setup_openpmd_record(self, dset, quantity):
        dset.attrs["unitDimension"] = unit_dimension_dict[quantity]
        dset.attrs["timeOffset"] = 0.0

    def setup_openpmd_component(self, dset):
        dset.attrs["unitSI"] = 1.0
