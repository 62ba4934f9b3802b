"""fv_dynamics: the k_split / remap level driver (fv_dynamics_nlm.F90:70-760).

Hydrostatic path.  One call advances the FV3 state one model time step bdt:

  T -> theta_v  ->  [ dyn_core -> tracer_2d -> Lagrangian_to_Eulerian ] x k_split
  -> T, plus A-grid lat-lon wind diagnostics (cubed_to_latlon).

State layout: dict of (npz, 6, jy, jx) padded arrays (staggered dims per
field), tracers as a list.  All control flow is static (jit-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..constants import CP as CP_AIR, KAPPA, ZVIR
from ..ops import fv_mapz
from ..ops.c2l import c2l_ord4
from ..ops.sw_core import F2P, SL
from ..parallel import halo
from .dyn_core import dyn_core, del2_cubed
from .tracer2d import tracer_2d


def total_energy_hydro(u, v, tv, delp, pe, peln, hs, grid, npx):
    """Vertically integrated total energy per column, hydrostatic remap-T
    form (compute_total_energy, fv_mapz_nlm.F90:1010-1032, and the
    last-step recomputation, :640-659).  All inputs padded; tv is VIRTUAL
    temperature on levels.  Returns (6, n, n) compute-domain te_2d."""
    from ..constants import RGAS

    n = npx - 1
    cs = SL(1, n)
    bs = SL(1, n + 1)
    rsin2 = grid["rsin2"][..., cs, cs]
    cosa_s = grid["cosa_s"][..., cs, cs]
    tv_c = tv[..., cs, cs]
    delp_c = delp[..., cs, cs]
    peln_c = peln[..., cs, cs]
    hs_c = hs[..., cs, cs]
    # gz at the model top: hs + sum_k rg*tv*(peln(k+1)-peln(k))
    gz_top = hs_c + jnp.sum(RGAS * tv_c * (peln_c[1:] - peln_c[:-1]), axis=0)
    te = pe[-1][..., cs, cs] * hs_c - pe[0][..., cs, cs] * gz_top
    u_b = u[..., bs, cs]
    v_b = v[..., cs, bs]
    ke = 0.25 * rsin2 * (
        u_b[..., :-1, :] ** 2 + u_b[..., 1:, :] ** 2
        + v_b[..., :, :-1] ** 2 + v_b[..., :, 1:] ** 2
        - (u_b[..., :-1, :] + u_b[..., 1:, :])
        * (v_b[..., :, :-1] + v_b[..., :, 1:]) * cosa_s)
    return te + jnp.sum(delp_c * (CP_AIR * tv_c + ke), axis=0)


def lagrangian_to_eulerian(state, vert, q, grid, topo, cfg, ak, bk,
                           akap, ptop, last_step, consv_te=0.0,
                           mode="traj"):
    """Vertical remap back to the Eulerian hybrid coordinate
    (fv_mapz_nlm.F90:60-960, remap_option=0 'remap T in logP', hydrostatic).

    vert: dict(pk, pe, peln, pkz) from the final geopk of dyn_core, full
    padded domain.  Returns (state, q, new vert).
    """
    pe, peln, pkz = vert["pe"], vert["peln"], vert["pkz"]
    pt, delp = state["pt"], state["delp"]
    u, v = state["u"], state["v"]
    npz = delp.shape[0]
    npx = cfg.npx
    npy = npx
    n = npx - 1
    kord_tm = abs(cfg.kord_tm)
    kord_tr = cfg.kord_tr
    kord_mt = cfg.kord_mt

    # reference split remap linearization (fv_mapz_tlm.F90:571-830): when
    # split_kord, each map1_ppm runs the PERT kord for the tangent on a
    # throwaway primal and the traj kord for the primal -> mix_primal.
    from .freeze import mix_primal

    def remap_mix(kord_t, kord_p, call):
        out = call(kord_t)
        if mode == "mixed" and cfg.split_kord and kord_p != kord_t:
            out = mix_primal(out, call(kord_p))
        return out

    # Remap only the lanes that are actually defined: the compute domain for
    # cell fields, plus the one valid (non-corner) halo ring the staggered
    # edge rows need.  The padded halo/corner lanes of `vert` are garbage
    # (they come from geopk over undefined delp) — never feeding them into
    # the PPM profile divisions is what keeps fwd/jvp/vjp NaN-free
    # independent of the grid sentinel magnitude.
    p = F2P
    cs = SL(1, n)

    pe_c = pe[..., cs, cs]
    peln_c = peln[..., cs, cs]
    ps_c = pe_c[-1]
    akx = ak.reshape((npz + 1,) + (1,) * (pe.ndim - 1))
    bkx = bk.reshape((npz + 1,) + (1,) * (pe.ndim - 1))
    pe2_c = akx + bkx * ps_c[None]
    pn2_c = jnp.log(pe2_c)
    pk2_c = jnp.exp(akap * pn2_c)

    # theta_v -> virtual temperature, remapped in log(p) (map_scalar, iv=1;
    # fv_mapz_nlm.F90:206-214, 367-400)
    pt_c = remap_mix(kord_tm, abs(cfg.kord_tm_pert), lambda kd:
                     fv_mapz.map1_ppm(peln_c, pt[..., cs, cs] * pkz[..., cs, cs],
                                      None, pn2_c, 1, kd, q_min=fv_mapz.T_MIN))

    # tracers in p (map1_q2 / mapn_tracer, iv=0) — one batched trace for all
    import jax

    from . import freeze
    if freeze.active() or mode == "mixed":
        # deterministic per-tracer tape order (see tracer2d)
        qs = jnp.stack([
            remap_mix(kord_tr, cfg.kord_tr_pert, lambda kd, qq=qq:
                      fv_mapz.map1_ppm(pe_c, qq[..., cs, cs], None, pe2_c,
                                       0, kd))
            for qq in q
        ], axis=0)
    else:
        qs = jax.vmap(
            lambda qq: fv_mapz.map1_ppm(pe_c, qq[..., cs, cs], None, pe2_c, 0,
                                        kord_tr)
        )(jnp.stack(q, axis=0))
    q = [q[i].at[..., cs, cs].set(qs[i]) for i in range(qs.shape[0])]

    # u on B rows 1..npy: pe averaged between adjacent cell rows (:547-570);
    # the j-1/j cell rows for the shared-edge B rows are valid edge halo.
    rm = slice(p(0), p(npy - 1) + 1)   # cell rows j-1, j=1..npy
    r0 = slice(p(1), p(npy) + 1)       # cell rows j
    bsl = slice(p(1), p(npy) + 1)      # B rows 1..npy
    pe_u = 0.5 * (pe[..., rm, cs] + pe[..., r0, cs])
    pe3_u = akx + 0.5 * bkx * (pe[-1][None][..., rm, cs] + pe[-1][None][..., r0, cs])
    u_mid = remap_mix(kord_mt, cfg.kord_mt_pert, lambda kd:
                      fv_mapz.map1_ppm(pe_u, u[..., bsl, cs], None, pe3_u,
                                       -1, kd))
    u = u.at[..., bsl, cs].set(u_mid)

    pe_v = 0.5 * (pe[..., cs, rm] + pe[..., cs, r0])
    pe3_v = akx + 0.5 * bkx * (pe[-1][None][..., cs, rm] + pe[-1][None][..., cs, r0])
    v_mid = remap_mix(kord_mt, cfg.kord_mt_pert, lambda kd:
                      fv_mapz.map1_ppm(pe_v, v[..., cs, bsl], None, pe3_v,
                                       -1, kd))
    v = v.at[..., cs, bsl].set(v_mid)

    if cfg.hydrostatic:
        pkz_new_c = (pk2_c[1:] - pk2_c[:-1]) / (akap * (pn2_c[1:] - pn2_c[:-1]))
    else:
        # NH: remap w (iv=-2 with the surface ws bottom condition,
        # fv_mapz_nlm.F90:420-423) and delz as specific volume (:298-302,
        # 424-431), then the NH equation-of-state pkz (:500-506)
        from ..constants import GRAV, RGAS
        rrg = -RGAS / GRAV
        w = state["w"]
        w_c = remap_mix(cfg.kord_wz, cfg.kord_wz, lambda kd:
                        fv_mapz.map1_ppm(pe_c, w[..., cs, cs],
                                         state["ws"][..., cs, cs], pe2_c,
                                         -2, kd))
        w = w.at[..., cs, cs].set(w_c)
        delz = state["delz"]
        sv_c = -delz[..., cs, cs] / delp[..., cs, cs]
        sv_c = remap_mix(kord_tm, abs(cfg.kord_tm_pert), lambda kd:
                         fv_mapz.map1_ppm(pe_c, sv_c, None, pe2_c, 1, kd))
        delz_new_c = -sv_c * (pe2_c[1:] - pe2_c[:-1])
        delz = delz.at[..., cs, cs].set(delz_new_c)
        state = dict(state, w=w, delz=delz)
        pkz_new_c = jnp.exp(akap * jnp.log(jnp.maximum(
            rrg * (pe2_c[1:] - pe2_c[:-1])
            / jnp.minimum(delz_new_c, -1e-2) * jnp.maximum(pt_c, 1e-10),
            1e-30)))

    if last_step:
        # total-energy-conserving temperature correction (fv_mapz_nlm.F90:
        # 633-785: recompute TE on the new coordinate, dtmp from the
        # global deficit against the step-entry te0_2d via reproducible
        # g_sum, applied as pt += dtmp*pkz before the virtual-T division)
        from ..constants import RGAS
        from ..ops.reductions import CONSV_MIN, g_sum

        dtmp = 0.0
        if cfg.consv_te > CONSV_MIN and "te0_2d" in state:
            hs_c = state["phis"][..., cs, cs]
            delp_new_c = pe2_c[1:] - pe2_c[:-1]
            gz_top = hs_c + jnp.sum(
                RGAS * pt_c * (pn2_c[1:] - pn2_c[:-1]), axis=0)
            u_b = u[..., SL(1, npy), cs]
            v_b = v[..., cs, SL(1, npx)]
            rsin2 = grid["rsin2"][..., cs, cs]
            cosa_s = grid["cosa_s"][..., cs, cs]
            ke = 0.25 * rsin2 * (
                u_b[..., :-1, :] ** 2 + u_b[..., 1:, :] ** 2
                + v_b[..., :, :-1] ** 2 + v_b[..., :, 1:] ** 2
                - (u_b[..., :-1, :] + u_b[..., 1:, :])
                * (v_b[..., :, :-1] + v_b[..., :, 1:]) * cosa_s)
            te_new = (pe2_c[-1] * hs_c - pe2_c[0] * gz_top
                      + jnp.sum(delp_new_c * (CP_AIR * pt_c + ke), axis=0))
            zsum1 = jnp.sum(pkz_new_c * delp_new_c, axis=0)
            zsum0 = ptop * (pk2_c[0] - pk2_c[-1]) + zsum1
            area_c = grid["area"][..., cs, cs]
            tpe = cfg.consv_te * g_sum(state["te0_2d"] - te_new, area_c)
            dtmp = tpe / (CP_AIR * g_sum(zsum0, area_c))
        # virtual T -> T (consv_te=0 => dtmp=0), fv_mapz_nlm.F90:857-892
        pt_c = (pt_c + dtmp * pkz_new_c) / (1.0 + ZVIR * qs[0])
    else:
        # back to theta_v
        pt_c = pt_c / pkz_new_c

    pt = pt.at[..., cs, cs].set(pt_c)
    delp = delp.at[..., cs, cs].set(pe2_c[1:] - pe2_c[:-1])
    ps = state.get("ps", jnp.zeros_like(pe[-1])).at[..., cs, cs].set(ps_c)

    state = dict(state, pt=pt, delp=delp, u=u, v=v, ps=ps)
    if last_step and "omga" in vert:
        om_c = _remap_omega(vert["omga"][..., cs, cs], peln_c, pn2_c)
        state["omga"] = jnp.zeros_like(delp).at[..., cs, cs].set(om_c)
    vert = dict(pe=pe2_c, peln=pn2_c, pk=pk2_c, pkz=pkz_new_c)
    return state, q, vert


def _remap_omega(om_c, peln_c, pn2_c):
    """Interpolate omga from the Lagrangian interfaces to the new Eulerian
    mid-levels in log-p (fv_mapz_nlm.F90:445-541, do_omega): omga sits at
    the lower interface of each Lagrangian layer (pe3(1)=0,
    pe3(k)=omga(k-1)); targets are dp2 = 0.5*(peln_new(k)+peln_new(k+1)).
    Bracket search vectorized as a per-column searchsorted (the Fortran
    k_next sweep); out-of-range targets extrapolate from the clipped end
    bracket instead of keeping the raw value."""
    import jax

    km = om_c.shape[0]
    pe3 = jnp.concatenate([jnp.zeros_like(om_c[:1]), om_c], axis=0)
    dp2 = 0.5 * (pn2_c[:-1] + pn2_c[1:])
    flat_pe = peln_c.reshape(km + 1, -1).T
    flat_o = pe3.reshape(km + 1, -1).T
    flat_dp = dp2.reshape(km, -1).T
    idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        flat_pe, flat_dp)
    k = jnp.clip(idx - 1, 0, km - 1)
    take = lambda arr, i: jnp.take_along_axis(arr, i, axis=1)
    pl, pr = take(flat_pe, k), take(flat_pe, k + 1)
    ol, orr = take(flat_o, k), take(flat_o, k + 1)
    out = ol + (orr - ol) * (flat_dp - pl) / (pr - pl)
    return out.T.reshape(om_c.shape)


def prep_stage(state, q, grid, topo, cfg, ptop):
    """Entry marshalling (traj_to_fv3 analogue): halo fills, entry pressures,
    T -> theta_v, zeroed scratch winds/capacitors (fv_dynamics_nlm.F90:
    397-430 + fv3jedi_lm_dynamics_mod.F90:717-809)."""
    npx = cfg.npx
    n = npx - 1
    akap = KAPPA
    npz = state["delp"].shape[0]
    dtype = state["u"].dtype
    jc = n + 2 * NG
    jb = jc + 1
    lead = (npz, state["delp"].shape[1])

    delp = halo.fill_halo_center(state["delp"], topo)
    pt_in = halo.fill_halo_center(state["pt"], topo)
    sphum = halo.fill_halo_center(q[0], topo)
    q = [sphum] + [halo.fill_halo_center(qq, topo) for qq in q[1:]]

    # entry pressures (= traj_to_fv3's compute_fv3_pressures on this delp)
    from .fv_pressure import compute_fv3_pressures
    pe, peln, pk, pkz = compute_fv3_pressures(delp, akap, ptop)

    # T -> theta_v (fv_dynamics_nlm.F90:397-430)
    if cfg.hydrostatic:
        pt = pt_in * (1.0 + ZVIR * sphum) / pkz
    else:
        # NH: delz needs valid halos for the zh build and the interface
        # advection; w is halo-filled per substep in stage_a.  The entry
        # pkz is the NH equation of state (rrg*delp/delz*Tv)**kappa — the
        # exact inverse of the L2E exit conversion (fv_mapz_nlm.F90:
        # 500-506), so a state at rest round-trips exactly.  (Full FV3
        # carries the L2E NH pkz in its persistent state; the LM wrapper's
        # compute_fv3_pressures reuses the hydrostatic pkz, which would
        # pump T/w at rest.)
        from ..constants import GRAV, RGAS
        rrg = -RGAS / GRAV
        delz = halo.fill_halo_center(state["delz"], topo)
        state = dict(state, delz=delz)
        tv = pt_in * (1.0 + ZVIR * sphum)
        pkz_nh = jnp.exp(akap * jnp.log(jnp.maximum(
            rrg * delp / jnp.minimum(delz, -1e-2)
            * jnp.maximum(tv, 1e-10), 1e-30)))
        pt = tv / pkz_nh

    from ..ops.reductions import CONSV_MIN
    if cfg.consv_te > CONSV_MIN and cfg.hydrostatic:
        # step-entry total energy (compute_total_energy called before the
        # k_split loop, fv_dynamics_nlm.F90:366-372; pt is temperature and
        # qc = zvir*sphum there)
        tv = pt_in * (1.0 + ZVIR * sphum)
        state = dict(state, te0_2d=total_energy_hydro(
            state["u"], state["v"], tv, delp, pe, peln, state["phis"],
            grid, npx))

    state = dict(
        state, delp=delp, pt=pt,
        uc=jnp.zeros(lead + (jc, jb), dtype),
        vc=jnp.zeros(lead + (jb, jc), dtype),
        divgd=jnp.zeros(lead + (jb, jb), dtype),
        # pre-populate loop-carried fields so the k_split carry pytree has a
        # fixed structure
        mfx=jnp.zeros(lead + (n, n + 1), dtype),
        mfy=jnp.zeros(lead + (n + 1, n), dtype),
        cx=jnp.zeros(lead + (jc, n + 1), dtype),
        cy=jnp.zeros(lead + (n + 1, jc), dtype),
        ps=jnp.zeros(lead[1:] + (jc, jc), dtype),
    )
    return state, q


def pre_acoustic_stage(state, grid, topo, cfg):
    """Start of one k_split sub-step: reset flux capacitors, refresh delp/pt
    halos (dyn_core_nlm.F90:260-266 + fv_dynamics_nlm.F90:459-467).
    Returns (state', dp1)."""
    npx = cfg.npx
    n = npx - 1
    npz = state["delp"].shape[0]
    dtype = state["u"].dtype
    jc = n + 2 * NG
    lead = (npz, state["delp"].shape[1])
    state = dict(
        state,
        mfx=jnp.zeros(lead + (n, n + 1), dtype),
        mfy=jnp.zeros(lead + (n + 1, n), dtype),
        cx=jnp.zeros(lead + (jc, n + 1), dtype),
        cy=jnp.zeros(lead + (n + 1, jc), dtype),
        delp=halo.fill_halo_center(state["delp"], topo),
        pt=halo.fill_halo_center(state["pt"], topo),
    )
    if not cfg.hydrostatic:
        state = dict(state, delz=halo.fill_halo_center(state["delz"], topo))
    return state, state["delp"]


def post_acoustic_stage(state, carry, q, dp1, grid, topo, cfg, ak, bk, ptop,
                        mdt, last_step, mode="traj"):
    """End of one k_split sub-step: acoustic_finish + tracer transport +
    vertical remap (fv_dynamics_nlm.F90:534-633).

    mode="mixed" applies the split-pert linearization to the tracer
    transport (hord_tr_pert / split_damp_tr, fv_tracer2d_tlm.F90:39-43) and
    to each remap call (split_kord) via freeze.mix_primal."""
    from .dyn_core import acoustic_finish
    from .freeze import mix_primal

    npx = cfg.npx
    npz = state["delp"].shape[0]
    akap = KAPPA
    state, vert = acoustic_finish(state, carry, grid, topo, cfg, mdt, npz)

    if len(q) > 0 and not cfg.inline_q:
        def tr(hord, nord_t, trdm):
            return tracer_2d(
                q, dp1, state["mfx"], state["mfy"], state["cx"], state["cy"],
                grid, topo, cfg, npx, hord, nord_tr=nord_t, trdm=trdm,
            )
        q_t = tr(cfg.hord_tr, cfg.nord_tr, cfg.trdm2)
        mix_tr = mode == "mixed" and (
            (cfg.split_hord and cfg.hord_tr_pert != cfg.hord_tr)
            or (cfg.split_damp_tr and (cfg.nord_tr_pert != cfg.nord_tr
                                       or cfg.trdm2_pert != cfg.trdm2)))
        if mix_tr:
            hord_p = cfg.hord_tr_pert if cfg.split_hord else cfg.hord_tr
            nord_p = cfg.nord_tr_pert if cfg.split_damp_tr else cfg.nord_tr
            trdm_p = cfg.trdm2_pert if cfg.split_damp_tr else cfg.trdm2
            q_t = mix_primal(q_t, tr(hord_p, nord_p, trdm_p))
        q = q_t

    if npz > 4:
        state, q, vert = lagrangian_to_eulerian(
            state, vert, q, grid, topo, cfg, ak, bk, akap, ptop, last_step,
            mode=mode,
        )
    if last_step and cfg.tau > 0.0:
        if cfg.grid_type < 4:
            state = rayleigh_super(state, grid, topo, cfg, mdt * cfg.k_split,
                                   ak, bk, ptop)
        else:
            state = rayleigh_friction(state, grid, topo, cfg,
                                      mdt * cfg.k_split, ak, bk, ptop)
    return state, q


def rayleigh_super(state, grid, topo, cfg, bdt, ak, bk, ptop):
    """Rayleigh friction on the top sponge levels (Rayleigh_Super,
    fv_dynamics_nlm.F90:770-937, non-HIWPP branch, conserve=.true.).

    rf(k) = dt/(tau*86400) * sin(pi/2 * log(rfc/pm)/log(rfc/ptop))^2 on the
    contiguous band of levels with reference pressure pm < rf_cutoff; winds
    are relaxed by 1/(1+rf) and the lost kinetic energy is returned as heat
    (pt is TEMPERATURE at this point, end of fv_dynamics).  u2f is constant
    per level in the reference too (its i,j dependence is vestigial), so the
    mpp halo update of u2f collapses away.  The KE diagnostic uses c2l_ord4
    where the reference uses c2l_ord2 (the LM carries no ord2 variant).
    """
    import numpy as np

    npz = state["delp"].shape[0]
    pe_ref = np.asarray(ak, np.float64) + np.asarray(bk, np.float64) * 1.0e5
    pm = ((pe_ref[1:] - pe_ref[:-1])
          / np.log(np.maximum(pe_ref[1:], 1e-10) / np.maximum(pe_ref[:-1], 1e-10)))
    rf = np.zeros(npz)
    kmax = 0
    for k in range(npz):
        if pm[k] < cfg.rf_cutoff:
            rf[k] = (abs(bdt) / (cfg.tau * 86400.0)
                     * np.sin(0.5 * np.pi * np.log(cfg.rf_cutoff / pm[k])
                              / np.log(cfg.rf_cutoff / ptop)) ** 2)
            kmax = k + 1
        else:
            break
    if kmax == 0:
        return state
    dtype = state["u"].dtype
    u2f = jnp.asarray(np.where(np.arange(npz) < kmax, 1.0 / (1.0 + rf), 1.0),
                      dtype).reshape(npz, 1, 1, 1)

    npx = cfg.npx
    cs = SL(1, npx - 1)
    ua, va = c2l_ord4(state["u"], state["v"], grid, topo, npx)
    heat = (0.5 * (ua[..., cs, cs] ** 2 + va[..., cs, cs] ** 2)
            * (1.0 - u2f ** 2)
            / (CP_AIR - (CP_AIR * KAPPA) * ptop
               / jnp.asarray(pm, dtype).reshape(npz, 1, 1, 1)))
    pt = state["pt"].at[..., cs, cs].add(heat)
    return dict(state, u=state["u"] * u2f, v=state["v"] * u2f, pt=pt)


def rayleigh_friction(state, grid, topo, cfg, bdt, ak, bk, ptop):
    """Rayleigh_Friction (fv_dynamics_nlm.F90:940-1076, conserve=.true.,
    hydrostatic): velocity-dependent drag above rf_cutoff with frictional
    heating.  The reference dispatches here for grid_type >= 4 (doubly
    periodic); the cube uses Rayleigh_Super."""
    import numpy as np

    npz = state["delp"].shape[0]
    npx = cfg.npx
    pe_ref = np.asarray(ak, np.float64) + np.asarray(bk, np.float64) * 1.0e5
    pm = ((pe_ref[1:] - pe_ref[:-1])
          / np.log(np.maximum(pe_ref[1:], 1e-10)
                   / np.maximum(pe_ref[:-1], 1e-10)))
    sday = 86400.0
    u000 = 4900.0
    rf = np.zeros(npz)
    kmax = 0
    for k in range(npz):
        if pm[k] < cfg.rf_cutoff:
            rf[k] = (abs(bdt) / (cfg.tau * sday)
                     * np.sin(0.5 * np.pi * np.log(cfg.rf_cutoff / pm[k])
                              / np.log(cfg.rf_cutoff / ptop)) ** 2)
            kmax = k + 1
        else:
            break
    if kmax == 0:
        return state
    dtype = state["u"].dtype
    rfk = jnp.asarray(np.where(np.arange(npz) < kmax, rf, 0.0),
                      dtype).reshape(npz, 1, 1, 1)
    active = jnp.asarray((np.arange(npz) < kmax).reshape(npz, 1, 1, 1))

    cs = SL(1, npx - 1)
    ua, va = c2l_ord4(state["u"], state["v"], grid, topo, npx)
    u2f_c = ua ** 2 + va ** 2
    # frictional heating (conserve path; pt is TEMPERATURE here)
    heat = (0.5 * u2f_c[..., cs, cs]
            / (CP_AIR - (CP_AIR * KAPPA) * ptop
               / jnp.asarray(pm, dtype).reshape(npz, 1, 1, 1))
            * (1.0 - 1.0 / (1.0 + rfk
                            * jnp.sqrt(u2f_c[..., cs, cs] / u000)) ** 2))
    pt = state["pt"].at[..., cs, cs].add(jnp.where(active, heat, 0.0))

    # drag: u2f -> rf*sqrt(u2f/u000), halo-updated, staggered averages
    u2f = rfk * jnp.sqrt(u2f_c / u000)
    u2f = halo.fill_halo_center(u2f, topo)
    u_div = 1.0 + 0.5 * (u2f[..., 0:-1, :] + u2f[..., 1:, :])
    u = state["u"].at[..., 1:-1, :].set(
        jnp.where(active, state["u"][..., 1:-1, :] / u_div,
                  state["u"][..., 1:-1, :]))
    v_div = 1.0 + 0.5 * (u2f[..., :, 0:-1] + u2f[..., :, 1:])
    v = state["v"].at[..., :, 1:-1].set(
        jnp.where(active, state["v"][..., :, 1:-1] / v_div,
                  state["v"][..., :, 1:-1]))
    return dict(state, u=u, v=v, pt=pt)


def fv_dynamics(state, q, grid, topo, cfg, bdt, ak, bk, ptop):
    """One nonlinear model step of bdt seconds (hydrostatic).

    state: u, v, w, pt (TEMPERATURE in/out), delp, phis (+ scratch C winds).
    q: list of tracers, q[0] = specific humidity.
    Returns (state, q) with pt back in temperature.
    """
    akap = KAPPA
    npz = state["delp"].shape[0]

    state, q = prep_stage(state, q, grid, topo, cfg, ptop)

    mdt = bdt / cfg.k_split

    def remap_step(state, q, last_step):
        """One k_split sub-step: acoustic core + tracer advection + remap."""
        state, dp1 = pre_acoustic_stage(state, grid, topo, cfg)
        import numpy as np
        pe_ref = np.asarray(ak, np.float64) + np.asarray(bk, np.float64) * 1e5
        pm = ((pe_ref[1:] - pe_ref[:-1])
              / np.log(np.maximum(pe_ref[1:], 1e-10)
                       / np.maximum(pe_ref[:-1], 1e-10)))
        dp_ref = pe_ref[1:] - pe_ref[:-1]     # (dyn_core_nlm.F90:216-219)
        state, vert = dyn_core(
            state, q, grid, topo, cfg, mdt, akap, ptop, False, pm=pm,
            compute_omega=cfg.compute_omega and last_step, dp_ref=dp_ref,
        )

        if len(q) > 0 and not cfg.inline_q:
            q = tracer_2d(
                q, dp1, state["mfx"], state["mfy"], state["cx"], state["cy"],
                grid, topo, cfg, cfg.npx, cfg.hord_tr,
                nord_tr=cfg.nord_tr, trdm=cfg.trdm2,
            )

        if npz > 4:
            state, q, vert = lagrangian_to_eulerian(
                state, vert, q, grid, topo, cfg, ak, bk, akap, ptop, last_step
            )
        return state, q

    for _ in range(cfg.k_split - 1):
        state, q = remap_step(state, q, False)
    state, q = remap_step(state, q, True)

    if "omga" in state and cfg.nf_omega > 0:
        # filter omega for the physics (fv_dynamics_nlm.F90:627-629)
        from .dyn_core import del2_cubed
        state = dict(state, omga=del2_cubed(
            state["omga"], 0.18 * grid["da_min"], grid, topo,
            cfg.nf_omega, cfg.npx))

    if cfg.tau > 0.0:
        if cfg.grid_type < 4:
            state = rayleigh_super(state, grid, topo, cfg, bdt, ak, bk, ptop)
        else:
            state = rayleigh_friction(state, grid, topo, cfg, bdt, ak, bk,
                                      ptop)

    # NOTE: the reference computes ua/va lat-lon diagnostics here
    # (cubed_to_latlon, fv_dynamics_nlm.F90:738-742); they are inputs to the
    # physics, not part of the dynamical prognostic state, so the facade
    # computes them via c2l_ord4 only when physics is enabled.
    return state, q
