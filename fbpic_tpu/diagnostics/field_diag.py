"""Field diagnostic: rho, E, B, J per azimuthal mode, thetaMode geometry.

Datasets have shape (2*Nm - 1, Nr, Nz): mode-0 real, then for each
m >= 1 the real and imaginary parts scaled by 2 (Lifschitz et al.
convention).  Behavioral reference:
/root/reference/fbpic/openpmd_diag/field_diag.py.
"""
import os

import numpy as np

from .generic import OpenPMDDiagnostic, _s
from .data_dict import unit_dimension_dict


class FieldDiagnostic(OpenPMDDiagnostic):
    """Writes grid fields at regular intervals."""

    def __init__(self, period=None, fldobject=None, comm=None,
                 fieldtypes=("rho", "E", "B", "J"), write_dir=None,
                 iteration_min=0, iteration_max=np.inf,
                 dt_period=None, sim=None):
        # `fldobject` may be the Simulation itself (our native API); the
        # reference API passes sim.fld which, here, aliases the Simulation
        self.sim = sim or fldobject
        dt_sim = self.sim.dt if self.sim is not None else None
        OpenPMDDiagnostic.__init__(
            self, period, comm, write_dir, iteration_min, iteration_max,
            dt_period=dt_period, dt_sim=dt_sim)
        self.fieldtypes = list(fieldtypes)
        self.coords = ["r", "t", "z"]

    # -----------------------------------------------------------------
    def write_hdf5(self, sim, iteration):
        if isinstance(sim, int):
            sim = self.sim
        self.sim = sim
        time = sim.time
        dt = sim.dt
        dz = sim.config.dz
        Nz = sim.Nz_phys
        Nr = sim.config.Nr
        zmin = sim.zmin + sim.nd_edge * dz

        filename = "data%08d.h5" % iteration
        fullpath = os.path.join(self.write_dir, "hdf5", filename)

        f = self.open_file(fullpath)
        if f is None:
            return
        self.setup_openpmd_file(f, iteration, time, dt)
        field_path = "/data/%d/fields/" % iteration
        field_grp = f.require_group(field_path)
        self.setup_openpmd_meshes_group(field_grp)

        data_shape = (2 * sim.config.Nm - 1, Nr, Nz)
        for fieldtype in self.fieldtypes:
            if fieldtype.startswith("rho") or fieldtype.endswith("_pml"):
                dset = field_grp.require_dataset(fieldtype, data_shape,
                                                 dtype="f8")
                self.setup_openpmd_mesh_component(dset, fieldtype)
                self.setup_openpmd_mesh_record(dset, fieldtype, dz, zmin)
                self.write_dataset(sim, dset, fieldtype)
            elif fieldtype in ("E", "B", "J"):
                for coord in self.coords:
                    quantity = "%s%s" % (fieldtype, coord)
                    dset = field_grp.require_dataset(
                        "%s/%s" % (fieldtype, coord), data_shape, dtype="f8")
                    self.setup_openpmd_mesh_component(dset, quantity)
                    self.write_dataset(sim, dset, quantity)
                self.setup_openpmd_mesh_record(
                    field_grp[fieldtype], fieldtype, dz, zmin)
            else:
                raise ValueError(
                    "Invalid string in fieldtypes: %s" % fieldtype)
        f.close()

    def get_dataset(self, sim, quantity):
        """Return the (Nm, Nz, Nr) complex array of `quantity`."""
        return sim.get_interp_field(quantity)

    def write_dataset(self, sim, dset, quantity):
        data = self.get_dataset(sim, quantity)  # (Nm, Nz, Nr)
        Nm = data.shape[0]
        dset[0, :, :] = data[0].T.real
        # Factor 2: Lifschitz et al. convention for m > 0
        for m in range(1, Nm):
            dset[2 * m - 1, :, :] = 2 * data[m].T.real
            dset[2 * m, :, :] = 2 * data[m].T.imag

    # -----------------------------------------------------------------
    def setup_openpmd_meshes_group(self, grp):
        grp.attrs["fieldSolver"] = _s("PSATD")
        grp.attrs["fieldBoundary"] = np.array(
            [b"reflecting", b"reflecting", b"reflecting", b"reflecting"])
        grp.attrs["particleBoundary"] = np.array(
            [b"absorbing", b"absorbing", b"absorbing", b"absorbing"])
        grp.attrs["currentSmoothing"] = _s("Binomial")
        grp.attrs["currentSmoothingParameters"] = _s(
            "period=1;numPasses=1;compensator=false")
        grp.attrs["chargeCorrection"] = _s("spectral")
        grp.attrs["chargeCorrectionParameters"] = _s("period=1")

    def setup_openpmd_mesh_record(self, dset, quantity, dz, zmin):
        # Map the record name onto a unit-dimension key
        if quantity.startswith("rho"):
            key = "rho"
        elif quantity.endswith("_pml"):
            key = quantity
        else:
            key = quantity[0]  # 'E', 'B' or 'J'
        self.setup_openpmd_record(dset, key)
        sim = self.sim
        dset.attrs["geometry"] = _s("thetaMode")
        dset.attrs["geometryParameters"] = _s(
            "m=%d;imag=+" % sim.config.Nm)
        dset.attrs["gridSpacing"] = np.array([sim.config.dr, dz])
        dset.attrs["gridGlobalOffset"] = np.array([0.5 * sim.config.dr,
                                                   zmin + 0.5 * dz])
        dset.attrs["axisLabels"] = np.array([b"r", b"z"])
        dset.attrs["dataOrder"] = _s("C")
        dset.attrs["gridUnitSI"] = 1.0
        dset.attrs["fieldSmoothing"] = _s("none")

    def setup_openpmd_mesh_component(self, dset, quantity):
        self.setup_openpmd_component(dset)
        dset.attrs["position"] = np.array([0.5, 0.5])


class ParticleChargeDensityDiagnostic(FieldDiagnostic):
    """Charge density of individual species via throwaway deposition.

    Reference: openpmd_diag/particle_density_diag.py.
    """

    def __init__(self, period=None, sim=None, species=None, comm=None,
                 write_dir=None, iteration_min=0, iteration_max=np.inf,
                 dt_period=None):
        species = species or {}
        self.species_dict = species
        fieldtypes = ["rho_%s" % name for name in species.keys()]
        FieldDiagnostic.__init__(
            self, period=period, fldobject=sim, comm=comm,
            fieldtypes=fieldtypes, write_dir=write_dir,
            iteration_min=iteration_min, iteration_max=iteration_max,
            dt_period=dt_period, sim=sim)

    def get_dataset(self, sim, quantity):
        # quantity = 'rho_<name>'
        name = quantity[4:]
        view = self.species_dict[name]
        return sim.deposit_single_species_rho(view)
