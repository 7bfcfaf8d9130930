"""Particle diagnostic: per-species arrays with selection filters.

Behavioral reference: /root/reference/fbpic/openpmd_diag/particle_diag.py.
"""
import os

import numpy as np

from ..constants import c
from .generic import OpenPMDDiagnostic, _s
from .data_dict import (unit_dimension_dict, macro_weighted_dict,
                        weighting_power_dict)


class ParticleDiagnostic(OpenPMDDiagnostic):
    """Writes selected particle quantities at regular intervals.

    Parameters
    ----------
    period: int -- output period in iterations
    species: dict {name: SpeciesView}
    select: dict, e.g. {'uz': [0.05, None]} -- select particles whose
        quantity lies in the given [min, max] range (None = unbounded)
    particle_data: list of quantities among
        'position', 'momentum', 'weighting', 'E', 'B', 'gamma', 'id'
    """

    def __init__(self, period=None, species=None, comm=None,
                 particle_data=("position", "momentum", "weighting"),
                 select=None, write_dir=None, iteration_min=0,
                 iteration_max=np.inf, dt_period=None, sim=None):
        self.species_dict = species or {}
        self.select = select
        self.particle_data = list(particle_data)
        dt_sim = sim.dt if sim is not None else None
        if dt_sim is None and self.species_dict:
            view = next(iter(self.species_dict.values()))
            dt_sim = getattr(getattr(view, "_sim", None), "dt", None)
        OpenPMDDiagnostic.__init__(
            self, period, comm, write_dir, iteration_min, iteration_max,
            dt_period=dt_period, dt_sim=dt_sim)

    # -----------------------------------------------------------------
    def write_hdf5(self, sim, iteration):
        if isinstance(sim, int):
            sim = None
        filename = "data%08d.h5" % iteration
        fullpath = os.path.join(self.write_dir, "hdf5", filename)
        f = self.open_file(fullpath)
        if f is None:
            return
        time = sim.time if sim is not None else iteration * 0.0
        dt = sim.dt if sim is not None else 0.0
        self.setup_openpmd_file(f, iteration, time, dt)
        particles_path = "/data/%d/particles/" % iteration
        for name, view in self.species_dict.items():
            grp = f.require_group(particles_path + name)
            self.write_species(grp, view)
        f.close()

    def apply_selection(self, view):
        """Return the boolean mask of selected (alive) particles."""
        w = view.w
        mask = w != 0
        if self.select is not None:
            data_getters = _quantity_getters(view)
            for quantity, bounds in self.select.items():
                vals = data_getters[quantity]()
                if bounds[0] is not None:
                    mask = mask & (vals > bounds[0])
                if bounds[1] is not None:
                    mask = mask & (vals < bounds[1])
        return mask

    def write_species(self, grp, view):
        mask = self.apply_selection(view)
        getters = _quantity_getters(view)
        n = int(mask.sum())

        # openPMD species-level records
        sc = view.config
        for record, value in (("charge", sc.q), ("mass", sc.m)):
            sub = grp.require_group(record)
            sub.attrs["value"] = value
            sub.attrs["shape"] = np.array([n], dtype=np.uint64)
            sub.attrs["unitDimension"] = unit_dimension_dict[record]
            sub.attrs["timeOffset"] = 0.0
            sub.attrs["macroWeighted"] = macro_weighted_dict[record]
            sub.attrs["weightingPower"] = weighting_power_dict[record]
            sub.attrs["unitSI"] = 1.0

        for quantity in self.particle_data:
            if quantity == "position":
                sub = grp.require_group("position")
                for comp in "xyz":
                    self._write_component(
                        sub, comp, getters[comp]()[mask])
                self._setup_record(sub, "position")
                # positionOffset (required by openPMD; all zeros)
                sub2 = grp.require_group("positionOffset")
                for comp in "xyz":
                    g = sub2.require_group(comp)
                    g.attrs["value"] = 0.0
                    g.attrs["shape"] = np.array([n], dtype=np.uint64)
                    g.attrs["unitSI"] = 1.0
                self._setup_record(sub2, "positionOffset")
            elif quantity == "momentum":
                sub = grp.require_group("momentum")
                m = view.m
                for comp in "xyz":
                    self._write_component(
                        sub, comp, getters["u" + comp]()[mask] * m * c)
                self._setup_record(sub, "momentum")
            elif quantity == "weighting":
                data = getters["w"]()[mask]
                self._write_component(grp, "weighting", data)
                self._setup_record(grp["weighting"], "weighting")
            elif quantity == "gamma":
                data = 1.0 / getters["inv_gamma"]()[mask]
                self._write_component(grp, "gamma", data)
                self._setup_record(grp["gamma"], "gamma")
            elif quantity == "id":
                ids = getters.get("id")
                if ids is not None:
                    self._write_component(grp, "id", ids()[mask])
                    self._setup_record(grp["id"], "id")
            elif quantity in ("E", "B"):
                # Fields gathered at particle positions are not stored in
                # the state between steps; skip silently (as reference
                # does when unavailable).
                continue
            else:
                raise ValueError("Invalid particle_data: %s" % quantity)

    def _write_component(self, grp, name, data):
        if name in grp:
            del grp[name]
        dset = grp.create_dataset(name, data=np.asarray(data))
        dset.attrs["unitSI"] = 1.0

    def _setup_record(self, dset, quantity):
        dset.attrs["unitDimension"] = unit_dimension_dict[quantity]
        dset.attrs["timeOffset"] = 0.0
        dset.attrs["macroWeighted"] = macro_weighted_dict[quantity]
        dset.attrs["weightingPower"] = weighting_power_dict[quantity]


def _quantity_getters(view):
    getters = {}
    for name in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w"):
        getters[name] = (lambda n=name: getattr(view, n))
    getters["gamma"] = lambda: 1.0 / view.inv_gamma
    state = view._state
    if state.ids is not None:
        n_active = view.Ntot
        getters["id"] = lambda: np.asarray(state.ids)[:n_active]
    return getters
