"""Embed the user's input script in the diagnostics output.

Reference: /root/reference/fbpic/openpmd_diag/inputscript_diag.py.
"""
import os
import sys

import numpy as np

from .generic import OpenPMDDiagnostic, _s


class InputScriptDiagnostic(OpenPMDDiagnostic):
    """Writes the text of the input script into each openPMD file."""

    def __init__(self, period=None, comm=None, write_dir=None,
                 input_script=None, dt_period=None, dt_sim=None):
        OpenPMDDiagnostic.__init__(self, period, comm, write_dir,
                                   dt_period=dt_period, dt_sim=dt_sim)
        if input_script is None:
            input_script = sys.argv[0]
        try:
            with open(input_script) as f:
                self.script_text = f.read()
        except (OSError, IOError):
            self.script_text = ""

    def write_hdf5(self, sim, iteration):
        filename = "data%08d.h5" % iteration
        fullpath = os.path.join(self.write_dir, "hdf5", filename)
        f = self.open_file(fullpath)
        if f is None:
            return
        time = sim.time if not isinstance(sim, int) else 0.0
        dt = sim.dt if not isinstance(sim, int) else 0.0
        self.setup_openpmd_file(f, iteration, time, dt)
        base = f["/data/%d/" % iteration]
        base.attrs["inputScript"] = _s(self.script_text)
        f.close()
