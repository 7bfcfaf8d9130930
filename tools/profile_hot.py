"""Per-piece timing of the PIC hot loop at the bench configuration.

The axon-tunneled TPU backend has ~30-45 ms of fixed per-dispatch
overhead, so naive timing of small jitted pieces is meaningless.  Each
piece is timed as the SLOPE of a jitted fori_loop over two iteration
counts: t(N2) - t(N1) / (N2 - N1) cancels both the dispatch overhead
and any loop-invariant setup.  Bodies thread a data dependence through
the carry so XLA cannot hoist or DCE the work.

Run: python tools/profile_hot.py
Results recorded in PERF_NOTES.md.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N1, N2 = 4, 16
REPS = 5


def slope_ms(jitted, carry):
    """Per-iteration ms from the (N1, N2) slope; median of REPS."""
    import jax
    ts = {}
    for n in (N1, N2):
        jax.block_until_ready(jitted(n, carry))  # compile+warm
        best = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(n, carry))
            best.append(time.perf_counter() - t0)
        ts[n] = np.median(best)
    return (ts[N2] - ts[N1]) / (N2 - N1) * 1e3


def make_loop(body):
    import jax
    return jax.jit(
        lambda n, carry: jax.lax.fori_loop(0, n, body, carry),
        static_argnums=(0,))


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from fbpic_tpu import Simulation
    from fbpic_tpu.constants import c
    from fbpic_tpu.lpa_utils.laser import add_laser_pulse, GaussianLaser

    NZ, NR, NM = 800, 50, 2
    dt = (30.e-6 - -10.e-6) / NZ / c
    sim = Simulation(
        NZ, 30.e-6, NR, 20.e-6, NM, dt,
        p_zmin=0., p_zmax=500.e-6, p_rmin=0., p_rmax=18.e-6,
        p_nz=2, p_nr=2, p_nt=4, n_e=4.e24, zmin=-10.e-6,
        n_order=32, boundaries={"z": "open", "r": "reflective"},
        random_seed=0,
    )
    add_laser_pulse(sim, GaussianLaser(a0=4.0, waist=5.e-6, tau=16.7e-15,
                                       z0=-8.e-6))
    sim.set_moving_window(v=c)
    sim.step(5, show_progress=False)

    state = sim.state
    aux = sim.aux
    config = sim.config
    sc = sim.species_configs[0]
    sp = state.species[0]
    print(f"grid: Nz={config.Nz} Nr={config.Nr} Nm={config.Nm} "
          f"capacity={sp.x.shape[0]} sort_K={sc.sort_K} "
          f"live={int(jnp.sum(sp.w != 0))}", flush=True)

    from fbpic_tpu.particles.sorted_deposit import (
        build_column_sort, _padded_arrays, deposit_rho_J_sorted)
    from fbpic_tpu.particles.gather import gather_fields_linear
    from fbpic_tpu.particles import push as pp
    from fbpic_tpu.fields import transform as tr
    from fbpic_tpu.fields import psatd_push as ps

    invdz = 1.0 / config.dz
    zmin = state.zmin
    tiny = 1e-38
    comp = (sp.comp_x, sp.comp_y, sp.comp_z) if sp.comp_x is not None \
        else None

    def dep(x, v):
        """Fold a cheap scalar of v into x to force the dependence."""
        leaves = jax.tree_util.tree_leaves(v)
        s = sum(l.ravel()[0].astype(jnp.float32) for l in leaves)
        return x + (s * tiny).astype(x.dtype)

    # --- 1. column sort
    def body_sort(i, z):
        sort = build_column_sort(z, sp.w, zmin, invdz, config.Nz, sc.sort_K)
        return dep(z, sort["valid"].sum())
    t = slope_ms(make_loop(body_sort), sp.z)
    print(f"1. build_column_sort:            {t:8.2f} ms", flush=True)

    sort0 = jax.jit(lambda: build_column_sort(
        sp.z, sp.w, zmin, invdz, config.Nz, sc.sort_K))()

    # --- 2. padded 8-channel gather
    def body_pad(i, x):
        padded = _padded_arrays(
            sort0, [x, sp.y, sp.z, sp.w, sp.ux, sp.uy, sp.uz, sp.inv_gamma])
        return dep(x, padded[0])
    t = slope_ms(make_loop(body_pad), sp.x)
    print(f"2. padded gather (8ch):          {t:8.2f} ms", flush=True)

    # --- 3. fused J+drho deposit (includes #2's gather)
    def body_fused(i, x):
        out = deposit_rho_J_sorted(
            sort0, x, sp.y, sp.z, sp.w, sc.q, sp.ux, sp.uy, sp.uz,
            sp.inv_gamma, 0.5 * config.dt, config.Nm, invdz, zmin,
            config.Nz, 1.0 / config.dr, 0.0, config.Nr,
            aux.ruyten_linear, zfold="clamp", comp=comp,
            with_drho=True, with_rho=False)
        return dep(x, [out[0].re, out[4].re])
    t = slope_ms(make_loop(body_fused), sp.x)
    print(f"3. fused J+drho deposit:         {t:8.2f} ms", flush=True)

    # --- 4. field gather (per-index path)
    def body_gath(i, x):
        EB = gather_fields_linear(
            x, sp.y, sp.z, state.interp, 20.e-6, invdz, zmin, config.Nz,
            1.0 / config.dr, 0.0, config.Nr, comp=comp)
        return dep(x, EB[0])
    t = slope_ms(make_loop(body_gath), sp.x)
    print(f"4. field gather (per-index):     {t:8.2f} ms", flush=True)

    # --- 5. transforms (carry the FULL output back so XLA cannot
    # slice through the einsums)
    CA = type(state.spect.Ep)

    def body_s2i(i, s):
        Er, Et, Ez, Br, Bt, Bz = tr.spect2interp_EB_fields(
            aux.mats, s.Ep, s.Em, s.Ez, s.Bp, s.Bm, s.Bz)
        return dataclasses.replace(s, Ep=Er, Em=Et, Ez=Ez,
                                   Bp=Br, Bm=Bt, Bz=Bz)
    t = slope_ms(make_loop(body_s2i), state.spect)
    print(f"5a. spect2interp EB (6 fields):  {t:8.2f} ms", flush=True)

    def body_i2s(i, itp):
        Jp, Jm, Jz = tr.interp2spect_J_fields(aux.mats, itp.Er, itp.Et,
                                              itp.Ez)
        return dataclasses.replace(itp, Er=Jp, Et=Jm, Ez=Jz)
    t = slope_ms(make_loop(body_i2s), state.interp)
    print(f"5b. interp2spect J (3 fields):   {t:8.2f} ms", flush=True)

    def body_zmany(i, s):
        out = tr.ifft_z_many(aux.mats, [s.Ep, s.Em, s.Ez, s.Bp, s.Bm,
                                        s.Bz])
        return dataclasses.replace(s, Ep=out[0], Em=out[1], Ez=out[2],
                                   Bp=out[3], Bm=out[4], Bz=out[5])
    t = slope_ms(make_loop(body_zmany), state.spect)
    print(f"5c. ifft_z_many (6 fields):      {t:8.2f} ms", flush=True)

    # --- 6. particle push (p + x), full-array carry
    EBc = jax.jit(lambda: gather_fields_linear(
        sp.x, sp.y, sp.z, state.interp, 20.e-6, invdz, zmin, config.Nz,
        1.0 / config.dr, 0.0, config.Nr, comp=comp))()

    def body_push(i, carry):
        x, y, z = carry
        spx = dataclasses.replace(sp, x=x, y=y, z=z)
        ux, uy, uz, ig = pp.push_p(spx, EBc[:3], EBc[3:], sc.q, sc.m,
                                   config.dt)
        spx = dataclasses.replace(spx, ux=ux, uy=uy, uz=uz, inv_gamma=ig)
        out = pp.push_x(spx, 0.5 * config.dt)
        return (out[0], out[1], out[2])
    t = slope_ms(make_loop(body_push), (sp.x, sp.y, sp.z))
    print(f"6. push p + half x:              {t:8.2f} ms", flush=True)

    # --- 7. PSATD EB push (full-array carry)
    def body_psatd(i, s):
        out = ps.push_eb_standard(
            s.Ep, s.Em, s.Ez, s.Bp, s.Bm, s.Bz, s.Jp, s.Jm, s.Jz,
            s.rho_prev, s.rho_next, aux.rho_prev_coef, aux.rho_next_coef,
            aux.j_coef, aux.C, aux.S_w, aux.kr, aux.kz, config.dt,
            use_true_rho=False)
        return dataclasses.replace(s, Ep=out[0], Em=out[1], Ez=out[2],
                                   Bp=out[3], Bm=out[4], Bz=out[5])
    t = slope_ms(make_loop(body_psatd), state.spect)
    print(f"7. PSATD EB push:                {t:8.2f} ms", flush=True)

    # --- 7b. filters + current correction
    def body_corr(i, s):
        Jp, Jm, Jz = ps.filter_vector(s.Jp, s.Jm, s.Jz, aux.filter_z,
                                      aux.filter_r)
        Jp, Jm, Jz = ps.correct_currents_curlfree_standard(
            s.rho_prev, s.rho_next, Jp, Jm, Jz,
            aux.kz, aux.kr, aux.inv_k2, 1.0 / config.dt)
        return dataclasses.replace(s, Jp=Jp, Jm=Jm, Jz=Jz)
    t = slope_ms(make_loop(body_corr), state.spect)
    print(f"7b. filter + correct currents:   {t:8.2f} ms", flush=True)

    # --- 8. whole step via the production multi_step (ground truth)
    for n in (4, 16):
        t0 = time.perf_counter()
        sim.step(n, show_progress=False)
        ts = time.perf_counter() - t0
        if n == 4:
            t4 = ts
    print(f"8. full step (slope 4->16):      "
          f"{(ts - t4) / 12 * 1e3:8.2f} ms", flush=True)

    # --- 9. one-hot contraction precision scan (S built in-loop from
    # int indices to keep compile payloads small)
    K = sc.sort_K
    Nrb = config.Nr + 4
    rng = np.random.default_rng(0)
    S_idx0 = jnp.asarray(rng.integers(0, Nrb, size=(config.Nz, K)),
                         dtype=jnp.int32)
    V0 = jnp.asarray(rng.standard_normal((config.Nz, K, 112)),
                     dtype=jnp.float32)

    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        def body_c(i, carry, prec=prec):
            S_idx, V = carry
            S = jax.nn.one_hot(S_idx, Nrb, dtype=jnp.float32)
            out = jnp.einsum("bkr,bkc->brc", S, V, precision=prec,
                             preferred_element_type=jnp.float32)
            # full-array dependence: rebuild V from out columns
            V2 = V + 1e-38 * out[:, 0:1, :]
            return (S_idx, V2)
        t = slope_ms(make_loop(body_c), (S_idx0, V0))
        print(f"9. one-hot contraction {name:8s}: {t:8.2f} ms",
              flush=True)

    def contract_once(S_idx, V, prec):
        S = jax.nn.one_hot(S_idx, Nrb, dtype=jnp.float32)
        return jnp.einsum("bkr,bkc->brc", S, V, precision=prec,
                          preferred_element_type=jnp.float32)
    o_hi = jax.jit(lambda a, b: contract_once(
        a, b, jax.lax.Precision.HIGHEST))(S_idx0, V0)
    o_h = jax.jit(lambda a, b: contract_once(
        a, b, jax.lax.Precision.HIGH))(S_idx0, V0)
    o_d = jax.jit(lambda a, b: contract_once(
        a, b, jax.lax.Precision.DEFAULT))(S_idx0, V0)
    m = float(jnp.max(jnp.abs(o_hi)))
    print(f"   rel HIGH {float(jnp.max(jnp.abs(o_h-o_hi)))/m:.1e} "
          f"(bitwise {bool(jnp.all(o_h == o_hi))}), "
          f"rel DEFAULT {float(jnp.max(jnp.abs(o_d-o_hi)))/m:.1e}",
          flush=True)

    # --- 10. packed single-key sort vs argsort
    def body_argsort(i, z):
        col = jnp.clip(jnp.floor(invdz * (z - zmin)).astype(jnp.int32),
                       0, config.Nz - 1)
        key = jnp.where(sp.w != 0, col, config.Nz)
        perm = jnp.argsort(key)
        return z + 1e-38 * perm[0].astype(z.dtype)
    t = slope_ms(make_loop(body_argsort), sp.z)
    print(f"10a. argsort(key):               {t:8.2f} ms", flush=True)

    Np = sp.z.shape[0]
    assert Np < (1 << 20)

    def body_packed(i, z):
        col = jnp.clip(jnp.floor(invdz * (z - zmin)).astype(jnp.int32),
                       0, config.Nz - 1)
        key = jnp.where(sp.w != 0, col, config.Nz)
        packed = (key << 20) | jnp.arange(Np, dtype=jnp.int32)
        s = jnp.sort(packed)
        perm = s & ((1 << 20) - 1)
        return z + 1e-38 * perm[0].astype(z.dtype)
    t = slope_ms(make_loop(body_packed), sp.z)
    print(f"10b. packed int32 sort:          {t:8.2f} ms", flush=True)

    # --- 11. pallas one-hot contraction (transition + kernel)
    from fbpic_tpu.particles.pallas_deposit import pallas_available
    if pallas_available():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        NRP = 64
        BZ = 4
        NZP = config.Nz - config.Nz % BZ

        def kernel(s_ref, v_ref, out_ref):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (NRP, K), 0).astype(jnp.float32)
            for b in range(BZ):
                irf = s_ref[b, 0:1, :]
                Sb = (iota == irf).astype(jnp.float32)
                out_ref[b] = jax.lax.dot_general(
                    Sb, v_ref[b], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        def pallas_contract(S_rows, V):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NZP, NRP, 112),
                                               jnp.float32),
                grid=(NZP // BZ,),
                in_specs=[
                    pl.BlockSpec((BZ, 1, K), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BZ, 112, K), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BZ, NRP, 112),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(S_rows, V)

        S_rows0 = S_idx0.astype(jnp.float32)[:NZP, None, :]
        Vt0 = jnp.swapaxes(V0, 1, 2)[:NZP]

        def body_pallas(i, carry):
            S_rows, V = carry
            out = pallas_contract(S_rows, V)
            V2 = V + 1e-38 * jnp.swapaxes(out[:, 0:112, :K], 1, 2)[
                :, :112, :K] if False else V + 1e-38 * out[:, 0, 0][
                :, None, None]
            return (S_rows, V2)
        try:
            t = slope_ms(make_loop(body_pallas), (S_rows0, Vt0))
            print(f"11. pallas one-hot contraction:  {t:8.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"11. pallas contraction FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # --- 12. column-batched matmul gather of 4-corner channel values
    from fbpic_tpu.particles.gather import _stack_interp_channels
    F = _stack_interp_channels(state.interp, config.Nm)    # (Nz, Nr, 24)
    pad_x, pad_y, pad_z = jax.jit(lambda: _padded_arrays(
        sort0, [sp.x, sp.y, sp.z]))()

    def body_colgather(i, carry):
        x, y, z = carry
        Fz1 = jnp.roll(F, -1, axis=0)
        Fr1 = jnp.concatenate([F[:, 1:], F[:, -1:]], axis=1)
        Fz1r1 = jnp.concatenate([Fz1[:, 1:], Fz1[:, -1:]], axis=1)
        Fbig = jnp.concatenate([F, Fr1, Fz1, Fz1r1], axis=-1)
        Gm = jnp.concatenate([jnp.roll(Fbig, 1, axis=0), Fbig], axis=1)
        r = jnp.sqrt(x * x + y * y)
        r_cell = (1.0 / config.dr) * r - 0.5
        z_cell = invdz * (z - zmin) - 0.5
        ir_low = jnp.clip(jnp.floor(r_cell).astype(jnp.int32), 0,
                          config.Nr - 1)
        iz_low = jnp.floor(z_cell).astype(jnp.int32)
        colv = jnp.arange(config.Nz, dtype=jnp.int32)[:, None]
        zoff = jnp.clip(iz_low - (colv - 1), 0, 1)
        row = zoff * config.Nr + ir_low
        Srow = jax.nn.one_hot(row, 2 * config.Nr, dtype=x.dtype)
        corners = jnp.einsum("bkj,bjc->bkc", Srow, Gm,
                             precision=jax.lax.Precision.HIGH,
                             preferred_element_type=x.dtype)
        x2 = x + 1e-38 * corners[..., 0]
        return (x2, y, z)
    t = slope_ms(make_loop(body_colgather), (pad_x, pad_y, pad_z))
    print(f"12. col-matmul gather corners:   {t:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
