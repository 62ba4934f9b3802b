"""Nonhydrostatic vertical solvers (first slice of the NH core).

TPU-native re-derivation of model/nh_utils_nlm.F90:

* `sim1_solver` (:1177-1310) — the semi-implicit vertically-propagating
  sound-wave solver: two Thomas (tridiagonal) sweeps for the
  nonhydrostatic pressure perturbation and the implicit w update,
  followed by the hypsometric dz update.  Columns are batched on the
  trailing axis; the k-recurrences are `lax.scan`s (the per-column
  sequential structure the reference vectorizes over i).
* `riem_solver_c` (:297-404) — the C-grid wrapper: builds the
  hydrostatic component pem / layer-mean pm2 and dz from gz, calls SIM1
  (a_imp > 0.5, the production default), and returns the full edge
  pressure pef and the updated geopotential gz.
* `update_dz_c` (:43-181) — advances the C-grid geopotential by upwind
  finite-volume advection with the interface-interpolated (ut, vt)
  winds, plus the dz_min monotonicity enforcement and the surface
  vertical velocity ws.

The D-grid pieces (update_dz_d :183-295, Riem_Solver3 with edge_profile
:1519) follow the same patterns and are the next NH increment; dyn_core
dispatch (dyn_core_nlm.F90:466-791) is wired once both exist.

All discrete decisions route through the frozen-branch tape (core/freeze)
so the staged TL/ADM discipline extends to the NH path unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import NG
from ..constants import GRAV, RGAS
from ..core.freeze import fbool, fmax, fscan
from ..parallel import halo

DZ_MIN = 2.0  # minimum layer thickness (m), nh_utils_nlm.F90:41
R3 = 1.0 / 3.0


def sim1_solver(dt, dm2, pt2, pm2, pem, w2, dz2, ws, kappa, p_fac=0.05):
    """SIM1_solver (nh_utils_nlm.F90:1177-1310), non-MOIST_CAPPA branch.

    Shapes: dm2/pt2/pm2/w2/dz2 (km, B); pem (km+1, B); ws (B,).
    Returns (pe, w2_new, dz2_new) with pe (km+1, B) the nonhydrostatic
    pressure perturbation at edges.
    """
    km = dm2.shape[0]
    gama = 1.0 / (1.0 - kappa)
    t1g = gama * 2.0 * dt * dt
    rdt = 1.0 / dt
    capa1 = kappa - 1.0

    w1 = w2
    pe_l = jnp.exp(gama * jnp.log(-dm2 / dz2 * RGAS * pt2)) - pm2

    g_rat = dm2[:-1] / dm2[1:]                        # (km-1, B)
    bb = jnp.concatenate([2.0 * (1.0 + g_rat),
                          2.0 * jnp.ones_like(dm2[:1])], axis=0)
    dd = jnp.concatenate([3.0 * (pe_l[:-1] + g_rat * pe_l[1:]),
                          3.0 * pe_l[-1:]], axis=0)

    # --- Thomas sweep for pp (the pressure-perturbation interpolant) ---
    def fwd_pp(carry, x):
        bet, pp_k = carry
        bbk, ddk, gr_km1 = x
        gam_k = gr_km1 / bet
        bet_new = bbk - gam_k
        pp_k1 = (ddk - pp_k) / bet_new
        return (bet_new, pp_k1), (pp_k1, gam_k)

    bet0 = bb[0]
    pp1 = jnp.zeros_like(bet0)
    pp2 = dd[0] / bet0
    (_, _), (pp_rest, gam) = lax.scan(
        fwd_pp, (bet0, pp2), (bb[1:], dd[1:], g_rat))
    # pp edges: [0, dd0/bet0, scan outputs...] -> (km+1, B)
    pp = jnp.concatenate([pp1[None], pp2[None], pp_rest], axis=0)

    def bwd_pp(pp_kp1, x):
        pp_k, gam_k = x
        out = pp_k - gam_k * pp_kp1
        return out, out

    _, pp_bwd = lax.scan(bwd_pp, pp[-1], (pp[1:-1], gam), reverse=True)
    pp = jnp.concatenate([pp1[None], pp_bwd, pp[-1:]], axis=0)

    # --- implicit w solver ---
    aa = t1g / (dz2[:-1] + dz2[1:]) * (pem[1:-1] + pp[1:-1])  # (km-1,B), k=2..km

    bet0 = dm2[0] - aa[0]
    w_1 = (dm2[0] * w1[0] + dt * pp[1]) / bet0

    def fwd_w(carry, x):
        bet, w_km1 = carry
        dmk, w1k, aak, aak1, dppk = x
        gam_k = aak / bet
        bet_new = dmk - (aak + aak1 + aak * gam_k)
        w_k = (dmk * w1k + dppk - aak * w_km1) / bet_new
        return (bet_new, w_k), (w_k, gam_k)

    dpp_mid = dt * (pp[2:km] - pp[1:km - 1])          # k=2..km-1
    (bet_f, w_last_mid), (w_mid, gam_w) = lax.scan(
        fwd_w, (bet0, w_1),
        (dm2[1:km - 1], w1[1:km - 1], aa[:km - 2], aa[1:km - 1], dpp_mid))

    p1 = t1g / dz2[-1] * (pem[-1] + pp[-1])
    gam_km = aa[-1] / bet_f
    bet_km = dm2[-1] - (aa[-1] + p1 + aa[-1] * gam_km)
    w_km = (dm2[-1] * w1[-1] + dt * (pp[km] - pp[km - 1]) - p1 * ws
            - aa[-1] * w_last_mid) / bet_km

    w_f = jnp.concatenate([w_1[None], w_mid, w_km[None]], axis=0)
    gam_full = jnp.concatenate([gam_w, gam_km[None]], axis=0)  # k=2..km

    def bwd_w(w_kp1, x):
        w_k, gam_kp1 = x
        out = w_k - gam_kp1 * w_kp1
        return out, out

    _, w_bwd = lax.scan(bwd_w, w_f[-1], (w_f[:-1], gam_full), reverse=True)
    w_new = jnp.concatenate([w_bwd, w_f[-1:]], axis=0)

    # --- pressure perturbation at edges from the w change ---
    pe = jnp.concatenate(
        [jnp.zeros_like(pem[:1]),
         jnp.cumsum(dm2 * (w_new - w1) * rdt, axis=0)], axis=0)

    # --- hypsometric dz update (bottom-up recurrence) ---
    def dz_of(p1v, pm_k, dm_k, pt_k):
        arg = fmax(p_fac * pm_k, p1v + pm_k)
        return -dm_k * RGAS * pt_k * jnp.exp(capa1 * jnp.log(arg))

    p1_km = (pe[km - 1] + 2.0 * pe[km]) * R3
    dz_km = dz_of(p1_km, pm2[-1], dm2[-1], pt2[-1])

    def up_dz(p1v, x):
        pe_k, pe_k1, pe_k2, bb_k, gr_k, pm_k, dm_k, pt_k = x
        p1n = (pe_k + bb_k * pe_k1 + gr_k * pe_k2) * R3 - gr_k * p1v
        return p1n, dz_of(p1n, pm_k, dm_k, pt_k)

    _, dz_rest = fscan(
        up_dz, p1_km,
        (pe[:km - 1], pe[1:km], pe[2:km + 1], bb[:km - 1], g_rat,
         pm2[:-1], dm2[:-1], pt2[:-1]), reverse=True)
    dz_new = jnp.concatenate([dz_rest, dz_km[None]], axis=0)
    return pe, w_new, dz_new


def _sim1(dt, dmg, pt2, pm2, pem, w2, dz2, ws2, akap, p_fac, use_pallas):
    """Dispatch: the Pallas TPU kernel on the non-differentiated
    trajectory path, the jnp/lax.scan oracle elsewhere (pallas_call has no
    automatic jvp/vjp; the mixed/TLM/ADM stages must stay jnp)."""
    if use_pallas:
        from ..ops.pallas_sim1 import sim1_solver_pallas

        return sim1_solver_pallas(dt, dmg, pt2, pm2, pem, w2, dz2, ws2,
                                  akap, p_fac)
    return sim1_solver(dt, dmg, pt2, pm2, pem, w2, dz2, ws2, akap, p_fac)


def riem_solver_c(dt, akap, ptop, hs, w3, pt, delp, gz, ws, p_fac=0.05,
                  use_pallas=False):
    """Riem_Solver_c (nh_utils_nlm.F90:297-404): C-grid semi-implicit
    solve.  All fields padded (npz[, +1], 6, jy, jx); pt is the C-grid
    virtual potential temperature analogue used by the solver (the caller
    passes what the reference passes).  Unit convention mirrors the
    reference: INPUT gz is height in meters (from update_dz_c), OUTPUT
    gz is height*grav anchored at hs (:362, :396-402).  Returns
    (pef, gz_new, w_new)."""
    km = delp.shape[0]
    shp = delp.shape[1:]
    # garbage-lane sanitizers (plain jnp, never binding on valid columns):
    # padded corner wedges carry undefined delp/pt/gz; keep every derived
    # quantity finite there so zero-cotangent lanes cannot breed NaNs in
    # the vjp (see NOTES_BUILD f32 sentinel rule)
    dm = jnp.maximum(delp.reshape(km, -1), 1e-10)
    pt2 = jnp.maximum(pt.reshape(km, -1), 1e-10)
    w2 = w3.reshape(km, -1)
    gz2 = gz.reshape(km + 1, -1)
    hs2 = hs.reshape(-1)
    ws2 = ws.reshape(-1)

    pem = jnp.concatenate(
        [jnp.full_like(dm[:1], ptop),
         ptop + jnp.cumsum(dm, axis=0)], axis=0)
    dz2 = jnp.minimum(gz2[1:] - gz2[:-1], -1e-2)
    pm2 = dm / jnp.maximum(jnp.log(pem[1:] / pem[:-1]), 1e-30)
    dmg = dm / GRAV

    pe, w_new, dz_new = _sim1(dt, dmg, pt2, pm2, pem, w2, dz2, ws2,
                              akap, p_fac, use_pallas)

    pef = pe + pem                     # full edge pressure; pe[0] = 0 -> ptop
    # Height*grav rebuilt from the new dz (bottom-up)
    gz_new = jnp.concatenate(
        [hs2[None] - jnp.cumsum((dz_new * GRAV)[::-1], axis=0)[::-1],
         hs2[None]], axis=0)
    return (pef.reshape((km + 1,) + shp),
            gz_new.reshape((km + 1,) + shp),
            w_new.reshape((km,) + shp))


def riem_solver3(dt, akap, ptop, zs, ws, delz_unused, pt, delp, zh, w,
                 p_fac=0.05, fp_out=True, use_pallas=False):
    """Riem_Solver3 (nh_core re-export of Riem_Solver3test,
    nh_utils_nlm.F90:406-573), a_imp > 0.999 (the SIM1 production
    branch), USE_COND off.

    Inputs padded (npz[, +1], 6, jy, jx); zh is HEIGHT in meters; pt the
    solver's (virtual potential) temperature variable.  Returns a dict
    with w, delz, zh, pe (hydrostatic edge), peln, pk3, ppe (full
    pressure when fp_out else the NH perturbation)."""
    km = delp.shape[0]
    shp = delp.shape[1:]
    # garbage-lane sanitizers, as in riem_solver_c
    dm_p = jnp.maximum(delp.reshape(km, -1), 1e-10)
    pt2 = jnp.maximum(pt.reshape(km, -1), 1e-10)
    w2 = w.reshape(km, -1)
    zh2 = zh.reshape(km + 1, -1)
    zs2 = zs.reshape(-1)
    ws2 = ws.reshape(-1)

    pem = jnp.concatenate(
        [jnp.full_like(dm_p[:1], ptop),
         ptop + jnp.cumsum(dm_p, axis=0)], axis=0)
    peln2 = jnp.log(pem)
    pk3 = jnp.exp(akap * peln2)
    pm2 = dm_p / jnp.maximum(peln2[1:] - peln2[:-1], 1e-30)
    dmg = dm_p / GRAV
    dz2 = jnp.minimum(zh2[1:] - zh2[:-1], -1e-2)

    pe2, w_new, dz_new = _sim1(dt, dmg, pt2, pm2, pem, w2, dz2, ws2,
                               akap, p_fac, use_pallas)

    ppe = pe2 + pem if fp_out else pe2
    zh_new = jnp.concatenate(
        [zs2[None] - jnp.cumsum(dz_new[::-1], axis=0)[::-1], zs2[None]],
        axis=0)
    rs = lambda x, k: x.reshape((k,) + shp)
    return dict(w=rs(w_new, km), delz=rs(dz_new, km),
                zh=rs(zh_new, km + 1), pe=rs(pem, km + 1),
                peln=rs(peln2, km + 1), pk3=rs(pk3, km + 1),
                ppe=rs(ppe, km + 1))


def edge_profile(q, dp0, limiter=0):
    """edge_profile (nh_utils_nlm.F90:1519-1614, non-uniform branch):
    tridiagonal edge-value reconstruction of a layer-mean wind profile.

    q: (km, ...) layer means; dp0: (km,) static reference thickness.
    The tridiagonal coefficients depend only on dp0 and are precomputed
    host-side; the solve is two linear k-recurrences.  Returns (km+1, ...)
    edge values."""
    import numpy as np

    km = q.shape[0]
    dp0 = np.asarray(dp0, np.float64)
    g0 = dp0[1] / dp0[0]
    xt1_top = 2.0 * g0 * (g0 + 1.0)
    bet_top = g0 * (g0 + 0.5)
    gam = np.zeros(km + 1)
    bet = np.zeros(km + 1)
    gam[0] = (1.0 + g0 * (g0 + 1.5)) / bet_top
    bet[0] = bet_top
    gks = np.zeros(km + 1)
    for k in range(1, km):                      # Fortran k=2..km
        gk = dp0[k - 1] / dp0[k]
        gks[k] = gk
        bet[k] = 2.0 + 2.0 * gk - gam[k - 1]
        gam[k] = gk / bet[k]
    gk = gks[km - 1]
    a_bot = 1.0 + gk * (gk + 1.5)
    xt1_bot = 2.0 * gk * (gk + 1.0)
    xt2_bot = gk * (gk + 0.5) - a_bot * gam[km - 1]

    qe0 = (xt1_top * q[0] + q[1]) / bet_top

    def fwd(qe_km1, x):
        qk_1, qk, gk_k, bet_k = x
        qe_k = (3.0 * (qk_1 + gk_k * qk) - qe_km1) / bet_k
        return qe_k, qe_k

    ks = jnp.asarray(gks[1:km], q.dtype)
    bs_ = jnp.asarray(bet[1:km], q.dtype)
    kb = (ks.reshape((km - 1,) + (1,) * (q.ndim - 1)),
          bs_.reshape((km - 1,) + (1,) * (q.ndim - 1)))
    _, qe_mid = lax.scan(fwd, qe0, (q[:-1], q[1:], kb[0], kb[1]))
    qe_bot = (xt1_bot * q[-1] + q[-2] - a_bot * qe_mid[-1]) / xt2_bot

    qe = jnp.concatenate([qe0[None], qe_mid, qe_bot[None]], axis=0)
    gamj = jnp.asarray(gam[:km], q.dtype).reshape(
        (km,) + (1,) * (q.ndim - 1))

    def bwd(qe_kp1, x):
        qe_k, g = x
        out = qe_k - g * qe_kp1
        return out, out

    _, qe_up = lax.scan(bwd, qe[-1], (qe[:-1], gamj), reverse=True)
    qe = jnp.concatenate([qe_up, qe[-1:]], axis=0)

    if limiter != 0:   # zero top/bottom edges that flip sign vs the layer
        top_bad = fbool(q[0] * qe[0] < 0.0)
        bot_bad = fbool(q[-1] * qe[-1] < 0.0)
        qe = qe.at[0].set(jnp.where(top_bad, 0.0, qe[0]))
        qe = qe.at[-1].set(jnp.where(bot_bad, 0.0, qe[-1]))
    return qe


def update_dz_d(dt, dp0, zs, zh, crx, cry, xfx, yfx, hord, grid, topo, npx,
                damp=None, ndif=0):
    """update_dz_d (nh_utils_nlm.F90:183-295): advance the D-grid height
    field with the full fv_tp_2d transport of each interface, using
    edge-profile-reconstructed courant numbers/area fluxes, optional del-n
    damping, monotonicity floor and surface vertical velocity.

    crx/xfx: (km, 6, jy, n+1) layer courant/area flux at D x-edges (as
    produced by d_sw); cry/yfx mirrored; zh (km+1, 6, jc, jc) heights in
    meters.  damp: None or (km+1, 1, 1, 1) del-n damping coefficient with
    static order ndif.  Returns (zh_new, ws)."""
    from ..ops.sw_core import del6_vt_flux
    from ..ops.transport import fv_tp_2d

    km = crx.shape[0]
    rdt = 1.0 / dt
    area = grid["area"]
    jc = zh.shape[-1]

    crx_adv = edge_profile(crx, dp0)
    xfx_adv = edge_profile(xfx, dp0)
    cry_adv = edge_profile(cry, dp0)
    yfx_adv = edge_profile(yfx, dp0)

    cs = SL_ = slice(NG, jc - NG)
    ra_x = area[..., :, cs] + (xfx_adv[..., :, :-1] - xfx_adv[..., :, 1:])
    ra_y = area[..., cs, :] + (yfx_adv[..., :-1, :] - yfx_adv[..., 1:, :])

    fx, fy = fv_tp_2d(zh, crx_adv, cry_adv, hord, xfx_adv, yfx_adv, grid,
                      topo, ra_x, ra_y)
    num = (zh[..., cs, cs] * area[..., cs, cs]
           + (fx[..., :, :-1] - fx[..., :, 1:])
           + (fy[..., :-1, :] - fy[..., 1:, :]))
    den = (ra_x[..., cs, :] + ra_y[..., :, cs] - area[..., cs, cs])
    zh_c = num / den
    if damp is not None and ndif > 0:
        _, fx2, fy2 = del6_vt_flux(ndif, damp, zh, grid, topo)
        rarea = grid["rarea"]
        zh_c = zh_c + (
            (fx2[..., cs, slice(NG, jc - NG + 1)][..., :, :-1]
             - fx2[..., cs, slice(NG, jc - NG + 1)][..., :, 1:])
            + (fy2[..., slice(NG, jc - NG + 1), cs][..., :-1, :]
               - fy2[..., slice(NG, jc - NG + 1), cs][..., 1:, :])
        ) * rarea[..., cs, cs]
    zh_new = zh.at[..., cs, cs].set(zh_c)

    ws = (zs - zh_new[-1]) * rdt

    def mono(zh_kp1, zh_k):
        out = fmax(zh_k, zh_kp1 + DZ_MIN)
        return out, out

    _, zh_up = fscan(mono, zh_new[-1], zh_new[:-1], reverse=True)
    zh_new = jnp.concatenate([zh_up, zh_new[-1:]], axis=0)
    return zh_new, ws


def update_dz_c(dt, dp0, zs, ut, vt, gz, grid, topo, npx):
    """update_dz_c (nh_utils_nlm.F90:43-181): advance the C-grid
    geopotential with upwind advection by the interface-interpolated
    (ut, vt) transport winds; returns (gz_new, ws).

    ut: (km, 6, jc, jb) C-wind * metric (the c_sw transport winds);
    vt: (km, 6, jb, jc); gz: (km+1, 6, jc, jc); dp0 (km,) reference
    thickness; zs (6, jc, jc) surface geopotential.
    """
    from ..ops.sw_core import fill_4corners

    km = ut.shape[0]
    rdt = 1.0 / dt
    area = grid["area"]

    top_ratio = dp0[0] / (dp0[0] + dp0[1])
    bot_ratio = dp0[km - 1] / (dp0[km - 2] + dp0[km - 1])
    int_ratio = (1.0 / (dp0[:-1] + dp0[1:])).reshape(km - 1, 1, 1, 1)
    d_hi = dp0[1:].reshape(km - 1, 1, 1, 1)
    d_lo = dp0[:-1].reshape(km - 1, 1, 1, 1)

    # interface-interpolated transport winds (km+1 interfaces)
    xfx = jnp.concatenate([
        (ut[0] + (ut[0] - ut[1]) * top_ratio)[None],
        (d_hi * ut[:-1] + d_lo * ut[1:]) * int_ratio,
        (ut[-1] + (ut[-1] - ut[-2]) * bot_ratio)[None],
    ], axis=0)
    yfx = jnp.concatenate([
        (vt[0] + (vt[0] - vt[1]) * top_ratio)[None],
        (d_hi * vt[:-1] + d_lo * vt[1:]) * int_ratio,
        (vt[-1] + (vt[-1] - vt[-2]) * bot_ratio)[None],
    ], axis=0)

    jc = gz.shape[-1]
    gx = fill_4corners(gz, 1, npx)
    selx = fbool(xfx[..., :, 1:jc] > 0.0)
    fx = xfx[..., :, 1:jc] * jnp.where(selx, gx[..., :, 0:jc - 1],
                                       gx[..., :, 1:jc])
    gy = fill_4corners(gz, 2, npx)
    sely = fbool(yfx[..., 1:jc, :] > 0.0)
    fy = yfx[..., 1:jc, :] * jnp.where(sely, gy[..., 0:jc - 1, :],
                                       gy[..., 1:jc, :])

    inner = slice(1, jc - 1)
    gz_new = gz
    num = (gz[..., inner, inner] * area[..., inner, inner]
           + (fx[..., inner, :-1] - fx[..., inner, 1:])
           + (fy[..., :-1, inner] - fy[..., 1:, inner]))
    den = (area[..., inner, inner]
           + (xfx[..., inner, 1:jc - 1] - xfx[..., inner, 2:jc])
           + (yfx[..., 1:jc - 1, inner] - yfx[..., 2:jc, inner]))
    gz_new = gz.at[..., inner, inner].set(num / den)

    ws = (zs - gz_new[-1]) * rdt

    # monotonicity: gz(k) >= gz(k+1) + dz_min, swept bottom-up
    def mono(gz_kp1, gz_k):
        out = fmax(gz_k, gz_kp1 + DZ_MIN)
        return out, out

    _, gz_up = fscan(mono, gz_new[-1], gz_new[:-1], reverse=True)
    gz_new = jnp.concatenate([gz_up, gz_new[-1:]], axis=0)
    return gz_new, ws
