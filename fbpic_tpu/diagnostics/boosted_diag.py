"""Back-transformed (boosted-frame -> lab-frame) diagnostics.

For a simulation running in a boosted frame, these diagnostics
accumulate fixed-t_lab snapshots on the fly: every boosted-frame step,
the plane where the snapshot's lab time intersects the current boosted
time is located in the box, the fields (or crossing particles) are
extracted there, Lorentz-transformed to the lab frame, and written into
the snapshot's lab-frame grid.

Behavioral reference: /root/reference/fbpic/openpmd_diag/
boosted_field_diag.py and boosted_particle_diag.py.  Host-side
implementation (one thin slice per step).
"""
import os

import numpy as np

from ..constants import c
from .generic import OpenPMDDiagnostic, _s
from .field_diag import FieldDiagnostic


class LabSnapshot(object):
    """One fixed-t_lab snapshot being accumulated."""

    def __init__(self, t_lab, zmin_lab, zmax_lab, dz_lab, Nr, Nm,
                 fieldtypes):
        self.t_lab = t_lab
        self.zmin_lab = zmin_lab
        self.zmax_lab = zmax_lab
        self.dz_lab = dz_lab
        self.Nz_lab = int(round((zmax_lab - zmin_lab) / dz_lab))
        # (field, Nm, Nz_lab, Nr) complex buffers
        self.names = []
        for ftype in fieldtypes:
            if ftype in ("E", "B", "J"):
                self.names += [ftype + comp for comp in "rtz"]
            else:
                self.names.append(ftype)
        self.data = {name: np.zeros((Nm, self.Nz_lab, Nr), complex)
                     for name in self.names}
        self.filled = np.zeros(self.Nz_lab, bool)
        self.written = False


class BackTransformedFieldDiagnostic(OpenPMDDiagnostic):
    """Accumulates lab-frame field snapshots from a boosted-frame run.

    Parameters (reference API: boosted_field_diag.py:25-120)
    ----------
    zmin_lab, zmax_lab: lab-frame z range of each snapshot
    v_lab: speed of the snapshot window in the lab frame
    dt_snapshots_lab: lab time between snapshots
    Ntot_snapshots_lab: number of snapshots
    gamma_boost: Lorentz factor of the frame
    """

    def __init__(self, zmin_lab, zmax_lab, v_lab, dt_snapshots_lab,
                 Ntot_snapshots_lab, gamma_boost, period=1, sim=None,
                 fldobject=None, comm=None,
                 fieldtypes=("rho", "E", "B", "J"), write_dir=None):
        sim = sim or fldobject
        OpenPMDDiagnostic.__init__(self, period, comm, write_dir,
                                   dt_sim=sim.dt if sim else None)
        self.sim = sim
        self.gamma_boost = gamma_boost
        self.beta_boost = np.sqrt(1.0 - 1.0 / gamma_boost**2)
        self.fieldtypes = list(fieldtypes)
        cfg = sim.config
        self.dz_lab = cfg.dz * gamma_boost * (1.0 + self.beta_boost)
        self.snapshots = []
        for i in range(Ntot_snapshots_lab):
            t_lab = i * dt_snapshots_lab
            self.snapshots.append(LabSnapshot(
                t_lab, zmin_lab + v_lab * t_lab, zmax_lab + v_lab * t_lab,
                self.dz_lab, cfg.Nr, cfg.Nm, self.fieldtypes))

    def write(self, sim):
        """Called every iteration: extract one slice per active snapshot."""
        if isinstance(sim, int):
            return
        self.extract_slices(sim)
        for i, snap in enumerate(self.snapshots):
            if snap.filled.all() and not snap.written:
                self.flush_snapshot(i, snap)
                snap.written = True

    # -----------------------------------------------------------------
    def extract_slices(self, sim):
        gamma, beta = self.gamma_boost, self.beta_boost
        t_b = sim.time
        zmin_b = sim.zmin
        dz = sim.config.dz
        Nz = sim.config.Nz

        # Fetch the fields once per step (host)
        grids = {}
        for name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
            grids[name] = getattr(sim.state.interp, name).to_numpy()
        need_J = any(n.startswith("J") for n in
                     self.snapshots[0].names)
        need_rho = "rho" in self.snapshots[0].names
        if need_J:
            from ..fields import transform as tr
            Jr, Jt = tr.spect2interp_vect(sim.aux.mats, sim.state.spect.Jp,
                                          sim.state.spect.Jm)
            grids["Jr"], grids["Jt"] = Jr.to_numpy(), Jt.to_numpy()
            grids["Jz"] = tr.spect2interp_scal(
                sim.aux.mats, sim.state.spect.Jz).to_numpy()
        if need_rho:
            from ..fields import transform as tr
            grids["rho"] = tr.spect2interp_scal(
                sim.aux.mats, sim.state.spect.rho_prev).to_numpy()

        for snap in self.snapshots:
            if snap.written:
                continue
            # Boosted position of the t_lab = const plane at time t_b
            z_b = (snap.t_lab / gamma - t_b) * c / beta
            z_lab = gamma * (z_b + beta * c * t_b)
            if z_lab < snap.zmin_lab or z_lab >= snap.zmax_lab:
                continue
            # Interpolate the slice at z_b between two cells
            iz_f = (z_b - zmin_b) / dz - 0.5
            iz0 = int(np.floor(iz_f))
            if iz0 < 0 or iz0 >= Nz - 1:
                continue
            s1 = iz_f - iz0
            slc = {name: (1 - s1) * g[:, iz0, :] + s1 * g[:, iz0 + 1, :]
                   for name, g in grids.items() if name in snap.names}
            slc = self._to_lab_frame(slc)
            iz_lab = int((z_lab - snap.zmin_lab) / snap.dz_lab)
            if 0 <= iz_lab < snap.Nz_lab:
                for name in snap.names:
                    snap.data[name][:, iz_lab, :] = slc[name]
                snap.filled[iz_lab] = True


    # -----------------------------------------------------------------
    # Device-resident capture (keeps chunked stepping intact: the
    # per-step slice extraction happens INSIDE the jitted chunk via
    # lax.scan -- the TPU analog of the reference's per-step CUDA
    # extraction kernel, boosted_field_diag.py:747)
    def device_capture(self, config=None, mats=None, own=None,
                       axis_name=None):
        """Build the in-jit per-step slice extractor.

        Single-chip (no arguments): slices the full grid.
        Decomposed (config=config_local, mats=local aux.mats,
        own=(n_guard, Nz_interior), axis_name=mesh axis): each rank
        slices its OWNED interior (guard interpolation reaches into
        exchanged halo cells, which replicate the neighbor), then the
        per-snapshot slices are psum'd so every rank returns the
        replicated global result -- the TPU analog of the reference's
        per-rank slice extraction + rank-0 assembly
        (boosted_field_diag.py:559-746).
        """
        import jax
        import jax.numpy as jnp
        from ..utils.complex_arr import CArr
        sim = self.sim
        cfg = config or sim.config
        mats = mats if mats is not None else sim.aux.mats
        gamma, beta = self.gamma_boost, self.beta_boost
        names = list(self.snapshots[0].names)
        need_J = any(n.startswith("J") for n in names)
        need_rho = "rho" in names
        rdt = np.float64 if jnp.zeros(()).dtype == jnp.float64 \
            else np.float32
        t_lab = jnp.asarray([s.t_lab for s in self.snapshots])
        Nz = cfg.Nz

        def zcols(F, rows_re, rows_im):
            re = (jnp.einsum("sk,mkr->msr", rows_re, F.re)
                  - jnp.einsum("sk,mkr->msr", rows_im, F.im))
            im = (jnp.einsum("sk,mkr->msr", rows_re, F.im)
                  + jnp.einsum("sk,mkr->msr", rows_im, F.re))
            return CArr(re, im)

        def dht_cols(M, X):
            return CArr(jnp.einsum("msr,mrk->msk", X.re, M),
                        jnp.einsum("msr,mrk->msk", X.im, M))

        def cap(state, aux):
            t_b = state.time
            z_b = (t_lab / gamma - t_b) * c / beta           # (S,)
            z_lab = gamma * (z_b + beta * c * t_b)
            zmin_here = state.zmin
            if axis_name is not None:
                g, Nz_int = own
                idx = jax.lax.axis_index(axis_name)
                zmin_here = zmin_here + (idx * Nz_int - g) * cfg.dz
            iz_f = (z_b - zmin_here) / cfg.dz - 0.5
            iz0 = jnp.clip(jnp.floor(iz_f).astype(jnp.int32), 0, Nz - 2)
            s1 = jnp.clip(iz_f - iz0, 0.0, 1.0)
            if axis_name is None:
                valid = (iz_f >= 0.0) & (iz_f <= Nz - 1.0)
            else:
                # Owned-interior claim: the slab interiors tile the
                # global box, so exactly one rank claims each plane
                # (edge ranks' claims are widened to +-inf so planes in
                # the global edge half-cells keep the single-chip clamp
                # behavior), intersected with the global-box bound.
                g, Nz_int = own
                ndev = jax.lax.psum(1, axis_name)
                idx = jax.lax.axis_index(axis_name)
                lo = jnp.where(idx == 0, -jnp.inf, float(g))
                hi = jnp.where(idx == ndev - 1, jnp.inf,
                               float(g + Nz_int))
                glob = iz_f + (idx * Nz_int - g)   # global-grid iz_f
                valid = ((iz_f >= lo) & (iz_f < hi)
                         & (glob >= 0.0) & (glob <= ndev * Nz_int - 1.0))

            out = {}
            for name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
                if name not in names:
                    continue
                g = getattr(state.interp, name)
                g0 = jnp.take(g.re, iz0, axis=1)             # (Nm, S, Nr)
                g1 = jnp.take(g.re, iz0 + 1, axis=1)
                re = (1 - s1)[None, :, None] * g0 \
                    + s1[None, :, None] * g1
                h0 = jnp.take(g.im, iz0, axis=1)
                h1 = jnp.take(g.im, iz0 + 1, axis=1)
                im = (1 - s1)[None, :, None] * h0 \
                    + s1[None, :, None] * h1
                out[name] = CArr(re, im)

            if need_J or need_rho:
                # Interpolated inverse-DFT rows (S, Nz): single-column
                # spect->interp, z first then Hankel (they commute)
                rows_re = ((1 - s1)[:, None] * mats.Wi_re[iz0]
                           + s1[:, None] * mats.Wi_re[iz0 + 1])
                rows_im = ((1 - s1)[:, None] * mats.Wi_im[iz0]
                           + s1[:, None] * mats.Wi_im[iz0 + 1])
            if need_rho:
                cols = zcols(state.spect.rho_prev, rows_re, rows_im)
                out["rho"] = dht_cols(mats.invM0, cols)
            if need_J:
                from ..fields.transform import pm_to_rt
                p = dht_cols(mats.invMp,
                             zcols(state.spect.Jp, rows_re, rows_im))
                m_ = dht_cols(mats.invMm,
                              zcols(state.spect.Jm, rows_re, rows_im))
                Fr, Ft = pm_to_rt(p, m_)
                out["Jr"], out["Jt"] = Fr, Ft
                out["Jz"] = dht_cols(
                    mats.invM0, zcols(state.spect.Jz, rows_re, rows_im))
            if axis_name is not None:
                # Zero the non-claiming ranks' (garbage-interpolated)
                # slices, then reduce so every rank holds the global
                # replicated result (z_lab is replicated by
                # construction: a pure function of t_lab and time)
                vmask = valid.astype(rdt)[None, :, None]
                out = {k: CArr(v.re * vmask, v.im * vmask)
                       for k, v in out.items()}
                out = jax.lax.psum(out, axis_name)
                valid = jax.lax.psum(
                    valid.astype(jnp.int32), axis_name) > 0
            return dict(valid=valid, z_lab=z_lab, slices=out)

        return cap

    def process_chunk(self, sim, caps):
        """Consume the stacked per-step captures of one chunk."""
        valid = np.asarray(caps["valid"])      # (T, S)
        z_lab = np.asarray(caps["z_lab"])      # (T, S)
        slices = {name: np.asarray(v.re) + 1j * np.asarray(v.im)
                  for name, v in caps["slices"].items()}  # (T, Nm, S, Nr)
        T = valid.shape[0]
        for t in range(T):
            for si, snap in enumerate(self.snapshots):
                if snap.written or not valid[t, si]:
                    continue
                zl = z_lab[t, si]
                if zl < snap.zmin_lab or zl >= snap.zmax_lab:
                    continue
                slc = {name: slices[name][t, :, si, :]
                       for name in snap.names}
                slc = self._to_lab_frame(slc)
                iz_lab = int((zl - snap.zmin_lab) / snap.dz_lab)
                if 0 <= iz_lab < snap.Nz_lab:
                    for name in snap.names:
                        snap.data[name][:, iz_lab, :] = slc[name]
                    snap.filled[iz_lab] = True
        for i, snap in enumerate(self.snapshots):
            if snap.filled.all() and not snap.written:
                self.flush_snapshot(i, snap)
                snap.written = True

    def _to_lab_frame(self, slc):
        """Lorentz transform with -beta (reference:
        boosted_field_diag.py:694-742)."""
        gamma = self.gamma_boost
        cbeta = c * self.beta_boost
        beta_c = self.beta_boost / c
        out = dict(slc)
        if "Er" in slc and "Bt" in slc:
            out["Er"] = gamma * (slc["Er"] + cbeta * slc["Bt"])
            out["Bt"] = gamma * (slc["Bt"] + beta_c * slc["Er"])
        if "Et" in slc and "Br" in slc:
            out["Et"] = gamma * (slc["Et"] - cbeta * slc["Br"])
            out["Br"] = gamma * (slc["Br"] - beta_c * slc["Et"])
        if "rho" in slc and "Jz" in slc:
            out["rho"] = gamma * (slc["rho"] + beta_c * slc["Jz"])
            out["Jz"] = gamma * (slc["Jz"] + cbeta * slc["rho"])
        return out

    # -----------------------------------------------------------------
    def flush_snapshot(self, i, snap):
        sim = self.sim
        filename = "data%08d.h5" % i
        fullpath = os.path.join(self.write_dir, "hdf5", filename)
        f = self.open_file(fullpath)
        if f is None:
            return
        self.setup_openpmd_file(f, i, snap.t_lab, self.dz_lab / c)
        grp = f.require_group("/data/%d/fields/" % i)
        Nm = sim.config.Nm
        for name, data in snap.data.items():
            shape = (2 * Nm - 1, data.shape[2], data.shape[1])
            if name[0] in "EBJ" and name != "rho":
                path = "%s/%s" % (name[0], name[1])
            else:
                path = name
            dset = grp.require_dataset(path, shape, dtype="f8")
            dset[0] = data[0].T.real
            for m in range(1, Nm):
                dset[2 * m - 1] = 2 * data[m].T.real
                dset[2 * m] = 2 * data[m].T.imag
            dset.attrs["unitSI"] = 1.0
            dset.attrs["position"] = np.array([0.5, 0.5])
        f.close()


# Reference alias
BoostedFieldDiagnostic = BackTransformedFieldDiagnostic


class BackTransformedParticleDiagnostic(OpenPMDDiagnostic):
    """Catches particles crossing the snapshot planes, advances them
    ballistically to the crossing time, and transforms them to the lab
    frame (reference: boosted_particle_diag.py:724-841).

    Each lab snapshot (fixed t_lab) is a plane moving at -c/beta in
    the boosted frame.  A particle is caught when it crosses the plane
    during the last step; its position is then pushed to the exact
    intersection time t_cross before the inverse Lorentz transform, so
    the lab-frame position carries no O(c*dt) smearing.  The
    previous-step position is reconstructed from the current momentum
    (z - vz*dt, as the reference does) rather than paired by array
    index across steps -- the resident layout re-sorts storage order
    every step, so index pairing would mismatch particles.
    """

    def __init__(self, zmin_lab, zmax_lab, v_lab, dt_snapshots_lab,
                 Ntot_snapshots_lab, gamma_boost, period=1, sim=None,
                 species=None, comm=None, write_dir=None):
        OpenPMDDiagnostic.__init__(self, period, comm, write_dir,
                                   dt_sim=sim.dt if sim else None)
        self.sim = sim
        self.species_dict = species or {}
        self.gamma_boost = gamma_boost
        self.beta_boost = np.sqrt(1.0 - 1.0 / gamma_boost**2)
        self.snapshots = [
            dict(t_lab=i * dt_snapshots_lab, buffers=[], written=False,
                 zmin_lab=zmin_lab + v_lab * i * dt_snapshots_lab,
                 zmax_lab=zmax_lab + v_lab * i * dt_snapshots_lab)
            for i in range(Ntot_snapshots_lab)]
        self._t_last = None

    def write(self, sim):
        if isinstance(sim, int):
            return
        gamma, beta = self.gamma_boost, self.beta_boost
        t_b = sim.time
        dt = sim.dt
        v_plane = -c / beta
        if self._t_last is None or t_b <= self._t_last:
            # Either no step has run yet (z - vz*dt would fabricate a
            # pre-start position) or this time was already processed
            # (step() re-invokes diagnostics at its start).
            self._t_last = max(t_b, self._t_last or t_b)
            return
        self._t_last = t_b
        for name, view in self.species_dict.items():
            cur = {k: getattr(view, k) for k in
                   ("x", "y", "z", "ux", "uy", "uz", "inv_gamma", "w")}
            state = view._state
            if state.ids is not None:
                lo = np.asarray(state.ids)[:len(cur["w"])].astype(
                    np.uint64)
                if state.ids_hi is not None:
                    hi = np.asarray(
                        state.ids_hi)[:len(cur["w"])].astype(np.uint64)
                    lo = (hi << np.uint64(32)) | lo
                cur["ids"] = lo
            vz = cur["uz"] * cur["inv_gamma"] * c
            z_prev = cur["z"] - vz * dt
            for snap in self.snapshots:
                if snap["written"]:
                    continue
                # Plane position in the boosted frame at t and t-dt
                # (the plane itself moves at -c/beta)
                z_plane = (snap["t_lab"] / gamma - t_b) * c / beta
                z_plane_prev = z_plane - v_plane * dt
                crossed = ((cur["z"] >= z_plane)
                           & (z_prev <= z_plane_prev)) \
                    | ((cur["z"] <= z_plane)
                       & (z_prev >= z_plane_prev))
                crossed &= cur["w"] != 0
                if not crossed.any():
                    continue
                sel = {k: v[crossed] for k, v in cur.items()}
                # Time at which each particle intersects the moving
                # plane, then ballistic push to that time
                # (reference: boosted_particle_diag.py:812-826)
                vz_s = sel["uz"] * sel["inv_gamma"] * c
                t_cross = t_b - (z_plane - sel["z"]) / (v_plane - vz_s)
                dtc = c * (t_cross - t_b) * sel["inv_gamma"]
                x_c = sel["x"] + dtc * sel["ux"]
                y_c = sel["y"] + dtc * sel["uy"]
                z_c = sel["z"] + dtc * sel["uz"]
                # Lorentz transform to the lab frame (inverse boost)
                # with the updated time t_cross
                gamma_p = 1.0 / sel["inv_gamma"]
                uz_lab = gamma * (sel["uz"] + beta * gamma_p)
                gamma_lab = np.sqrt(1 + sel["ux"]**2 + sel["uy"]**2
                                    + uz_lab**2)
                z_lab = gamma * (z_c + beta * c * t_cross)
                keep = (z_lab >= snap["zmin_lab"]) & \
                    (z_lab < snap["zmax_lab"])
                buf = dict(
                    x=x_c[keep], y=y_c[keep], z=z_lab[keep],
                    ux=sel["ux"][keep], uy=sel["uy"][keep],
                    uz=uz_lab[keep], w=sel["w"][keep],
                    inv_gamma=1.0 / gamma_lab[keep],
                    species=name)
                if "ids" in sel:
                    buf["ids"] = sel["ids"][keep]
                snap["buffers"].append(buf)
        # Flush snapshots whose plane has left the box
        for i, snap in enumerate(self.snapshots):
            z_plane = (snap["t_lab"] / gamma - t_b) * c / beta
            if not snap["written"] and z_plane < sim.zmin:
                self._flush(i, snap)
                snap["written"] = True

    def _flush(self, i, snap):
        import h5py
        from .particle_diag import write_openpmd_species_arrays
        filename = "particles%08d.h5" % i
        fullpath = os.path.join(self.write_dir, "hdf5", filename)
        with h5py.File(fullpath, "w") as f:
            self.setup_openpmd_file(f, i, snap["t_lab"], 0.0)
            for name, view in self.species_dict.items():
                bufs = [b for b in snap["buffers"] if b["species"] == name]
                grp = f.require_group("/data/%d/particles/%s" % (i, name))
                arrays = {}
                for key in ("x", "y", "z", "ux", "uy", "uz", "w"):
                    if bufs:
                        arrays[key] = np.concatenate(
                            [b[key] for b in bufs])
                    else:
                        arrays[key] = np.zeros(0)
                ids = None
                if bufs and "ids" in bufs[0]:
                    ids = np.concatenate([b["ids"] for b in bufs])
                write_openpmd_species_arrays(
                    grp, arrays, view.q, view.m, ids=ids)


BoostedParticleDiagnostic = BackTransformedParticleDiagnostic
