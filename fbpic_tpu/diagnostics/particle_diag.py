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
                # Gather the current grid fields at the particle
                # positions (reference gathers into species.Ex.. buffers
                # during the step, particle_diag.py; here the gather
                # rides the stored interpolation grid at write time)
                sim = view._sim
                if sim is None:
                    continue
                from ..particles.gather import gather_fields_linear
                cfg = sim.config
                comps = gather_fields_linear(
                    getters["x"](), getters["y"](), getters["z"](),
                    sim.state.interp, sim.get_rmax_gather(),
                    1.0 / cfg.dz, sim.state.zmin, cfg.Nz,
                    1.0 / cfg.dr, 0.0, cfg.Nr)
                trio = comps[:3] if quantity == "E" else comps[3:]
                sub = grp.require_group(quantity)
                for comp, vals in zip("xyz", trio):
                    self._write_component(sub, comp,
                                          np.asarray(vals)[mask])
                self._setup_record(sub, quantity)
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

        def _get_ids():
            lo = np.asarray(state.ids)[:n_active].astype(np.uint64)
            if state.ids_hi is not None:
                hi = np.asarray(state.ids_hi)[:n_active].astype(np.uint64)
                return (hi << np.uint64(32)) | lo
            return lo
        getters["id"] = _get_ids
    return getters


def write_openpmd_species_arrays(grp, arrays, q, m, ids=None):
    """Write plain numpy particle arrays as openPMD records.

    arrays: dict with x, y, z, ux, uy, uz, w (SI / dimensionless u).
    Used by the back-transformed particle diagnostic so its output has
    the same layout as ParticleDiagnostic (position/momentum groups
    with unitDimension etc.; reference boosted_particle_diag.py writes
    through the same OpenPMDDiagnostic machinery).
    """
    n = len(arrays["w"])

    def setup(dset, quantity):
        dset.attrs["unitDimension"] = unit_dimension_dict[quantity]
        dset.attrs["timeOffset"] = 0.0
        dset.attrs["macroWeighted"] = macro_weighted_dict[quantity]
        dset.attrs["weightingPower"] = weighting_power_dict[quantity]

    def write_comp(g, name, data):
        if name in g:
            del g[name]
        dset = g.create_dataset(name, data=np.asarray(data))
        dset.attrs["unitSI"] = 1.0
        return dset

    for record, value in (("charge", q), ("mass", m)):
        sub = grp.require_group(record)
        sub.attrs["value"] = value
        sub.attrs["shape"] = np.array([n], dtype=np.uint64)
        sub.attrs["unitDimension"] = unit_dimension_dict[record]
        sub.attrs["timeOffset"] = 0.0
        sub.attrs["macroWeighted"] = macro_weighted_dict[record]
        sub.attrs["weightingPower"] = weighting_power_dict[record]
        sub.attrs["unitSI"] = 1.0

    sub = grp.require_group("position")
    for comp in "xyz":
        write_comp(sub, comp, arrays[comp])
    setup(sub, "position")
    sub2 = grp.require_group("positionOffset")
    for comp in "xyz":
        g2 = sub2.require_group(comp)
        g2.attrs["value"] = 0.0
        g2.attrs["shape"] = np.array([n], dtype=np.uint64)
        g2.attrs["unitSI"] = 1.0
    setup(sub2, "positionOffset")

    sub = grp.require_group("momentum")
    for comp in "xyz":
        write_comp(sub, comp, np.asarray(arrays["u" + comp]) * m * c)
    setup(sub, "momentum")

    dset = write_comp(grp, "weighting", arrays["w"])
    setup(dset, "weighting")

    if ids is not None:
        dset = write_comp(grp, "id", ids)
        setup(dset, "id")
