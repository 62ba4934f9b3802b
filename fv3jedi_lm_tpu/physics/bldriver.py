"""Louis/Lock boundary-layer K-theory driver.

Whole-array JAX re-derivation of src/physics/turbulence/bldriver.F90:23-1300:
BL_DRIVER = PRELIMINARY (:300) -> LOUIS_DIFF (:373) -> LOCK_DIFF (:655,
surface-driven convective part; the radiative part is compiled but disabled
by the LM's RADLW_DEP=0 default since RADLW is not in the trajectory,
bldriver.F90:66-67,885) -> TRIDIAG_SETUP (:504) -> ORODRAG (:612).

This runs on the TRAJECTORY ONLY: the turbulence linearization freezes the
diffusion coefficients (frozen-K), so nothing here is differentiated — the
per-column searches (mpbl_depth parcel ascent, PBL-top diagnosis) are plain
lax.scan / arg-reductions with no tape or custom-derivative concerns.

Layout: vertical axis LEADING.  Layer fields (npz, *S), edge fields
(npz+1, *S), surface fields (*S), with S the spatial dims (6, ny, nx).
Vertical index 0 = model top (Fortran level 1), npz-1 = surface layer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import CP, GRAV, KAPPA, KARMAN, P00, RGAS, VIREPS, ALHL, ALHS, TICE
from .qsat import dqsat

AKMAX = 1.0e4
QLCRIT = 1.0e-6
ABUOY = 0.23
ASHEAR = 25.0
WENTRMAX = 0.05
RAMP = 20.0


def default_turb_params(pref):
    """TURBPARAMS(22) + TURBPARAMSI(4) tables
    (fv3jedi_lm_turbulence_mod.F90:82-107); pref = ak + bk*p00 (npz+1,)."""
    return dict(
        louis=5.0, lambdam=160.0, lambdam2=1.0, lambdah=160.0, lambdah2=1.0,
        zkmenv=3000.0, zkhenv=3000.0, minthick=0.1, minshear=0.0030,
        c_b=2.5101471e-8, lambda_b=1500.0, akhmmax=500.0,
        prandtlsfc=1.0, prandtlrad=0.75, beta_rad=0.50, beta_surf=0.25,
        khradfac=0.85, khsfcfac=0.45, tpfac_surf=20.0, entrate_surf=1.5e-3,
        pceff_surf=0.5, louis_memory=-999.0,
        kpblmin=int(np.sum(np.asarray(pref) < 50000.0)),
        lock_on=1, pblht_option=1, radlw_dep=0,
    )


def _preliminary(t, qv, phalf, th, qit, qlt, dt):
    """bldriver.F90:300-373: heights, virtual temperatures, RDZ, DMI."""
    npz = t.shape[0]
    pke = (phalf / P00) ** KAPPA
    dzc = (CP / GRAV) * th * (pke[1:] - pke[:-1])       # (npz, S)
    # zhalf[l] = sum_{m >= l} dzc[m]; zhalf[npz] = 0
    zhalf = jnp.concatenate(
        [jnp.cumsum(dzc[::-1], axis=0)[::-1],
         jnp.zeros_like(dzc[:1])], axis=0)
    zfull = 0.5 * (zhalf[:-1] + zhalf[1:])
    tv = t * (1.0 + VIREPS * qv - qit - qlt)
    pv = tv * (th / t)
    tve = 0.5 * (tv[:-1] + tv[1:])
    rdz = phalf[1:npz] / (RGAS * tve) / (zfull[:-1] - zfull[1:])
    dmi = (GRAV * dt) / (phalf[1:] - phalf[:-1])
    # running 1-2-1 smooth of the bottom levels of virtual theta (:364-369)
    if npz >= 7:
        b = npz - 1
        pv = pv.at[b].set(pv[b - 1] * 0.25 + pv[b] * 0.75)
        for k in range(b - 1, b - 5, -1):
            pv = pv.at[k].set(
                pv[k - 1] * 0.25 + pv[k] * 0.50 + pv[k + 1] * 0.25)
    return zfull, zhalf, tv, pv, rdz, dmi


def _louis_diff(zpbl, zfull, zhalf, pv, u, v, p):
    """bldriver.F90:373-502: Louis stability-function diffusivities at the
    interior edges.  Returns (kh, km) with edge shape (npz+1, S)."""
    npz = zfull.shape[0]
    almfac = alhfac = 1.2
    pbl = jnp.maximum(zpbl, zfull[npz - 1])

    zm1, z0 = zfull[:-1], zfull[1:]            # layers e-1, e at edge e=1..
    pvm1, pv0 = pv[:-1], pv[1:]
    dz = jnp.maximum(zm1 - z0, p["minthick"])
    tm = 0.5 * (pvm1 + pv0)
    dtv = pvm1 - pv0
    du = jnp.sqrt((u[:-1] - u[1:]) ** 2 + (v[:-1] - v[1:]) ** 2) / dz
    ri = GRAV * (dtv / dz) / (tm * jnp.maximum(du, p["minshear"]) ** 2)

    ze = zhalf[1:npz]
    lam_m = jnp.maximum(0.1 * pbl * jnp.exp(-((ze / p["zkmenv"]) ** 2)),
                        p["lambdam2"])
    lam_h = jnp.maximum(0.1 * pbl * jnp.exp(-((ze / p["zkhenv"]) ** 2)),
                        p["lambdah2"])
    alm = almfac * (KARMAN * ze / (1.0 + KARMAN * (ze / lam_m))) ** 2
    alh = alhfac * (KARMAN * ze / (1.0 + KARMAN * (ze / lam_h))) ** 2

    louis = p["louis"]
    # unstable branch (ri < 0)
    ps_u = ((zm1 / z0) ** (1.0 / 3.0) - 1.0) ** 3
    ps_u = alh * jnp.sqrt(jnp.maximum(ps_u / (ze * dz ** 3), 0.0))
    ps_u = ri / (1.0 + (3.0 * louis * louis) * ps_u
                 * jnp.sqrt(jnp.maximum(-ri, 0.0)))
    kh_u = 1.0 - (louis * 3.0) * ps_u
    km_u = 1.0 - (louis * 2.0) * ps_u
    # stable branch (ri >= 0)
    ps_s = jnp.sqrt(1.0 + louis * jnp.maximum(ri, 0.0))
    kh_s = 1.0 / (1.0 + (louis * 3.0) * ri * ps_s)
    km_s = ps_s / (ps_s + (louis * 2.0) * ri)

    unstable = ri < 0.0
    kh_i = jnp.where(unstable, kh_u, kh_s)
    km_i = jnp.where(unstable, km_u, km_s)
    km_i = jnp.minimum(km_i * du * alm, p["akhmmax"])
    kh_i = jnp.minimum(kh_i * du * alh, p["akhmmax"])

    z_edge = jnp.zeros_like(zhalf[:1])
    kh = jnp.concatenate([z_edge, kh_i, z_edge], axis=0)
    km = jnp.concatenate([z_edge, km_i, z_edge], axis=0)
    return kh, km


def _take_k(a, idx):
    """a[idx] along leading axis, idx shaped S -> result shaped S."""
    return jnp.take_along_axis(a, idx[None], axis=0)[0]


def _mpbl_depth(t, q, u, v, zfull, pfull, b_star, u_star, p):
    """bldriver.F90:1091-1180: surface parcel ascent -> (ipbl, ztop).

    ipbl is the PYTHON layer index of the mixed-layer top (Fortran ipbl-1).
    Columns where the ascent never terminates keep ipbl=1 / ztop at the
    last level reached (the reference leaves ipbl undefined there; such
    columns are masked out by the caller's b_star>0 gate in practice).
    """
    npz = t.shape[0]
    S = t.shape[1:]
    vscale = 0.25 / 100.0
    tep0 = t[-1] * (1.0 + p["tpfac_surf"] * b_star / GRAV)

    idx = np.arange(npz - 2, 0, -1)
    xs = (t[idx], q[idx], u[idx], v[idx], zfull[idx], pfull[idx],
          jnp.asarray(idx))

    def body(c, x):
        t2, q2, u2, v2, z2, pp, kp = x
        done0 = c["done"]
        du = jnp.sqrt((u2 - c["u1"]) ** 2 + (v2 - c["v1"]) ** 2) / (z2 - c["z1"])
        du = jnp.minimum(du, 1.0e-8)           # as the reference (:1145)
        entrate_x = p["entrate_surf"] * (1.0 + du / vscale)
        entfr = jnp.minimum(entrate_x * (z2 - c["z1"]), 0.99)
        qp = c["qp"] + entfr * (q2 - c["qp"])
        tep = c["tep"] - GRAV * (z2 - c["z1"]) / CP
        tep = tep + entfr * (t2 - tep)
        dqsp, qsp = dqsat(tep, pp)
        dqp = jnp.maximum(qp - qsp, 0.0) / (1.0 + (ALHL / CP) * dqsp)
        qp = qp - dqp
        tep = tep + p["pceff_surf"] * ALHL * dqp / CP
        trigger = (t2 >= tep) | (entfr >= 0.9899)
        newly = trigger & ~done0
        new = dict(
            tep=jnp.where(done0, c["tep"], tep),
            qp=jnp.where(done0, c["qp"], qp),
            z1=jnp.where(done0, c["z1"], z2),
            t1=jnp.where(done0, c["t1"], t2),
            u1=jnp.where(done0, c["u1"], u2),
            v1=jnp.where(done0, c["v1"], v2),
            ztop=jnp.where(newly, 0.5 * (z2 + c["z1"]), c["ztop"]),
            ipbl=jnp.where(newly, (kp + 1).astype(jnp.int32),
                           c["ipbl"]),
            done=done0 | trigger,
        )
        return new, None

    carry0 = dict(tep=tep0, qp=q[-1], z1=zfull[-1], t1=t[-1], u1=u[-1],
                  v1=v[-1], ztop=zfull[-1],
                  ipbl=jnp.ones(S, jnp.int32), done=jnp.zeros(S, bool))
    out, _ = lax.scan(body, carry0, xs)
    return out["ipbl"], out["ztop"]


def _radml_depth(svp, kct, zt, slvcp, zfull, zhalf, critjump=0.3):
    """radml_depth (bldriver.F90:1180-1253): descend a cloud-top parcel of
    liquid static energy svp from layer kct until it is warmer than the
    environment (or a stable jump > critjump is crossed); returns
    (zradbase, zradml).  Whole-array masked scan (per-column kct)."""
    npz = slvcp.shape[0]
    S = slvcp.shape[1:]
    entrate = 0.2 / 200.0

    h1_0 = _take_k(zfull, kct)
    t1_0 = _take_k(slvcp, kct)
    # parcel already warmer than cloud top -> zb = h1, zml = 0 (:1211-1215)
    pre = t1_0 < svp
    carry0 = dict(
        svpar=svp, h1=h1_0, t1=t1_0,
        zb=jnp.where(pre, h1_0, jnp.zeros(S, slvcp.dtype)),
        zml=jnp.zeros(S, slvcp.dtype),
        done=pre,
    )
    idx = np.arange(1, npz)
    xs = (slvcp[1:], zfull[1:], zhalf[1:npz], jnp.asarray(idx))

    def body(c, x):
        t2, h2, zh_k, j = x
        active = (j > kct) & ~c["done"]
        # exit 1: parcel warmer than env at this level (:1222-1231)
        hit = t2 < c["svpar"]
        interp = jnp.abs(c["t1"] - t2) > 0.2
        zb1 = jnp.where(
            interp,
            jnp.maximum(h2 + (c["h1"] - h2) * (c["svpar"] - t2)
                        / jnp.where(interp, c["t1"] - t2, 1.0), 0.0),
            h2)
        # exit 2: stable jump (:1234-1238), only for j > kct+1
        jump = ((c["t1"] - t2) > critjump) & (j > kct + 1)
        zb2 = zh_k
        take1 = active & hit
        take2 = active & ~hit & jump
        zb_new = jnp.where(take1, zb1, jnp.where(take2, zb2, c["zb"]))
        zml_new = jnp.where(take1 | take2, zt - zb_new, c["zml"])
        # entrain and step down (:1241-1246)
        entfr = jnp.minimum(entrate * (c["h1"] - h2), 1.0)
        svpar_new = c["svpar"] + entfr * (t2 - c["svpar"])
        cont = active & ~hit & ~jump
        return dict(
            svpar=jnp.where(cont, svpar_new, c["svpar"]),
            h1=jnp.where(cont, h2, c["h1"]),
            t1=jnp.where(cont, t2, c["t1"]),
            zb=zb_new, zml=zml_new,
            done=c["done"] | take1 | take2,
        ), None

    out, _ = lax.scan(body, carry0, xs)
    # fallthrough: zb = 0, zml = zt (:1250-1251)
    zb = jnp.where(out["done"], out["zb"], 0.0)
    zml = jnp.where(out["done"], out["zml"], zt)
    return zb, zml


def _lock_rad(t, qv, qc, hleff, slv, zfull, pf, phalf, zhalf, density,
              ipbl, zsml, conv, k_sfc, k_t_entr, k_m_entr, p, tdtlw):
    """Radiatively/buoyancy-reversal driven cloud-top mixing
    (bldriver.F90:852-1075, the RADLW_DEP=1 branch; the reference LM
    hardwires RADLW_DEP=0, fv3jedi_lm_turbulence_mod.F90:107, because the
    LW heating rate is not in its trajectory — here it is available behind
    params['radlw_dep']=1 with traj field `tdtlw`): finds the lowest
    stratocumulus top below zcldtopmax, measures the cloud-top LW flux
    divergence and the buoyancy-reversal mixing fraction chis, runs
    radml_depth for the mixed-layer base, and adds the cloud-top
    entrainment + interior K profiles.  Returns (k_t_entr, k_m_entr).

    k_sfc is the surface-driven entrainment coefficient added at slot ipbl
    by the caller (needed for the zradbase<zsml suppression, :1060-1068).
    """
    npz = t.shape[0]
    kidx = jnp.arange(npz).reshape((npz,) + (1,) * (t.ndim - 1))
    zcldtopmax = 3.0e3

    dqs_all, _ = dqsat(t, pf)

    # kmax: highest level below zcldtopmax (:853-859)
    below = zhalf[:npz] < zcldtopmax
    kmax = jnp.argmax(below, axis=0).astype(jnp.int32)

    # cloud top: LOWEST boundary qc[k]>=crit, qc[k-1]<crit, stable (:862-871)
    cond = jnp.concatenate([
        jnp.zeros_like(qc[:1], dtype=bool),
        (qc[1:] >= QLCRIT) & (qc[:-1] < QLCRIT)
        & ((slv[:-1] - slv[1:]) > 0.0)], axis=0)
    cond = cond & (kidx >= kmax[None])
    found = jnp.any(cond, axis=0)
    kct = (npz - 1) - jnp.argmax(cond[::-1], axis=0).astype(jnp.int32)
    kct = jnp.where(found, kct, 1)          # safe placeholder when not found

    # thin diffusive veil: look one level down (:877-881)
    kct2 = jnp.minimum(kct + 1, npz - 1)
    qct = _take_k(qc, kct)
    veil = (qct < 10.0 * QLCRIT) & (_take_k(qc, kct2) >= 10.0 * qct)
    kct = jnp.where(veil, kct2, kct)

    # cloud bottom (:883-891); sentinel npz -> zhalf[npz] = 0 (surface)
    condb = jnp.concatenate([
        jnp.zeros_like(qc[:1], dtype=bool),
        (qc[1:] < QLCRIT) & (qc[:-1] >= QLCRIT)], axis=0)
    condb = condb & (kidx >= kct[None])
    foundb = jnp.any(condb, axis=0)
    kcb = (npz - 1) - jnp.argmax(condb[::-1], axis=0).astype(jnp.int32)
    kcb = jnp.where(foundb, kcb, npz)
    active = found & (kct != kcb)

    # cloud-top LW flux divergence (:897-904)
    in_win = (kidx >= kct[None]) & (kidx <= jnp.minimum(kct + 2, npz - 1)[None])
    maxradf = jnp.max(jnp.where(in_win, -tdtlw, -jnp.inf), axis=0)
    maxradf = maxradf * CP * (
        (_take_k(phalf, kct + 1) - _take_k(phalf, kct)) / GRAV)
    maxradf = jnp.maximum(maxradf, 0.0)

    # buoyancy-reversal mixing fraction chis (:906-929)
    hlf = _take_k(hleff, kct)
    slv_t = _take_k(slv, jnp.maximum(kct - 1, 0))
    slv_c = _take_k(slv, kct)
    qc_t = _take_k(qc, jnp.maximum(kct - 1, 0))
    qv_t = _take_k(qv, jnp.maximum(kct - 1, 0))
    dqs_c = _take_k(dqs_all, kct)
    tmp1 = (slv_t - hlf * qc_t) - (slv_c - hlf * qct)
    tmp1 = dqs_c * tmp1 / CP
    tmp2 = (qv_t + qc_t) - (_take_k(qv, kct) + qct)
    chis = -qct * (1.0 + hlf * dqs_c / CP)
    denom = tmp2 - tmp1
    chis = jnp.where(denom >= 0.0, 0.0,
                     chis / jnp.where(denom >= 0.0, 1.0, denom))
    chis = jnp.minimum(chis, 1.0)

    slmix = (1.0 - chis) * (slv_c - hlf * qct) + chis * (slv_t - hlf * qc_t)
    svpcp = slmix / CP
    stab = slv_t - slv_c
    dsiems = (slv_c - slmix) / jnp.where(stab == 0.0, 1.0, stab)
    dsiems = jnp.clip(dsiems, 0.0, 10.0)
    zradtop = _take_k(zhalf, kct)

    # radml_depth (:946-965)
    radperturb = jnp.minimum(maxradf / 100.0, 0.3)
    svp = svpcp - radperturb
    slvcp = slv / CP
    zb_s, zml_s = _radml_depth(svp, kct, zradtop, slvcp, zfull, zhalf)
    at_bot = kct >= npz - 1
    zradbase = jnp.where(at_bot, 0.0, zb_s)
    zradml = jnp.where(at_bot, zradtop, zml_s)
    zcloud = zradtop - _take_k(zhalf, kcb)

    go = active & (zradml > 0.0)

    # velocity scales (:971-996)
    zradml_s = jnp.where(go, zradml, 1.0)
    vrad3 = GRAV * zradml * maxradf / _take_k(density, kct) / slv_c
    tmp1b = GRAV * jnp.maximum(0.1, (slv_t - slv_c) / CP) / (slv_c / CP)
    vbr3 = jnp.maximum(tmp1b * zcloud, 0.0) ** 3
    vbr3 = ABUOY * chis ** 2 * jnp.maximum(dsiems, 0.0) * jnp.sqrt(vbr3)
    near_top = zradtop > zcldtopmax - 500.0
    ramp_f = (zcldtopmax - zradtop) / 500.0
    vrad3 = jnp.maximum(jnp.where(near_top, vrad3 * ramp_f, vrad3), 0.0)
    vbr3 = jnp.maximum(jnp.where(near_top, vbr3 * ramp_f, vbr3), 0.0)
    vrad = vrad3 ** (1.0 / 3.0)
    vbrv = vbr3 ** (1.0 / 3.0)

    tmp2b = (vrad ** 2 + vbrv ** 2) / zradml_s
    wentr_rad = jnp.minimum(
        WENTRMAX, p["beta_rad"] * (vrad3 + vbr3) / zradml_s
        / (tmp1b + tmp2b))
    # height-dependent fudge factors (:1003-1014)
    wentr_rad = jnp.where(zradtop < 500.0, 0.0, wentr_rad)
    wentr_rad = jnp.where((zradtop > 500.0) & (zradtop <= 800.0),
                          wentr_rad * (zradtop - 500.0) / 300.0, wentr_rad)
    wentr_rad = jnp.where(zradtop < 2400.0,
                          wentr_rad * (zradtop / 800.0), 3.0 * wentr_rad)

    zf_t = _take_k(zfull, jnp.maximum(kct - 1, 0))
    zf_c = _take_k(zfull, kct)
    k_entr_rad = jnp.minimum(AKMAX, wentr_rad * (zf_t - zf_c))

    at_kct = kidx == kct[None]
    k_t_entr = k_t_entr + jnp.where(go[None] & at_kct, k_entr_rad[None], 0.0)
    k_m_entr = k_m_entr + jnp.where(go[None] & at_kct, k_entr_rad[None], 0.0)

    # surface top == radiative top: combined entrainment REPLACES the slot
    # (:1021-1048)
    vsurf3, vshear3 = p["_vsurf3"], p["_vshear3"]
    same = go & conv & (ipbl == kct)
    tmp2c = ((vbr3 + vrad3 + vsurf3 + vshear3) ** (2.0 / 3.0)) / zradml_s
    wentr2 = jnp.minimum(
        WENTRMAX,
        jnp.maximum(0.0, ((p["beta_surf"] * (vsurf3 + vshear3)
                           + p["beta_rad"] * (vrad3 + vbr3)) / zradml_s)
                    / (tmp1b + tmp2c)))
    k_entr2 = jnp.minimum(AKMAX, wentr2 * (zf_t - zf_c))
    k_t_entr = jnp.where(same[None] & at_kct, k_entr2[None], k_t_entr)
    k_m_entr = jnp.where(same[None] & at_kct, k_entr2[None], k_m_entr)

    # interior radiative K profile (:1050-1058)
    ztmp = jnp.maximum(0.0, (zhalf[:npz] - zradbase[None]) / zradml_s[None])
    k_int = (p["khradfac"] * KARMAN * (vrad + vbrv)[None] * ztmp
             * zradml_s[None] * ztmp
             * jnp.sqrt(jnp.maximum(1.0 - ztmp, 0.0)))
    k_int = jnp.minimum(k_int, AKMAX)
    in_int = go[None] & (kidx > kct[None]) & (ztmp > 0.0)
    k_t_entr = k_t_entr + jnp.where(in_int, k_int, 0.0)
    k_m_entr = k_m_entr + jnp.where(in_int, k_int * p["prandtlrad"], 0.0)

    # zradbase below the surface mixed layer: cancel the surface
    # entrainment at ipbl (:1060-1068)
    suppress = go & (zradbase < zsml) & conv & (ipbl > kct)
    at_ipbl = kidx == ipbl[None]
    k_t_entr = k_t_entr - jnp.where(suppress[None] & at_ipbl,
                                    k_sfc[None], 0.0)
    k_m_entr = k_m_entr - jnp.where(suppress[None] & at_ipbl,
                                    k_sfc[None], 0.0)
    return k_t_entr, k_m_entr


def _lock_diff(t, qv, qit, qlt, u, v, zfull, pfull, zhalf, frland,
               u_star, b_star, kh, km, p, tdtlw=None, phalf_e=None):
    """bldriver.F90:655-1085: Lock et al. mixed-layer entrainment
    diffusivities merged into (kh, km) — the surface-driven part always,
    plus the cloud-top radiative/buoyancy-reversal part when
    params['radlw_dep']==1 (the reference compiles it but hardwires the
    flag to 0, fv3jedi_lm_turbulence_mod.F90:107)."""
    npz = t.shape[0]
    kidx = jnp.arange(npz).reshape((npz,) + (1,) * (t.ndim - 1))

    # liquid static energy (hleff blend, :745-770)
    hleff = jnp.where(
        t <= TICE - RAMP, ALHS,
        jnp.where(t < TICE,
                  ((t - TICE + RAMP) * ALHL + (TICE - t) * ALHS) / RAMP,
                  ALHL))
    qc = qit + qlt
    slv = CP * t * (1.0 + VIREPS * qv - qc) + GRAV * zfull - hleff * qc

    conv = b_star > 0.0
    ipbl, zsml = _mpbl_depth(t, qv, u, v, zfull, pfull, b_star, u_star, p)

    # interior stable-interface limit (:800-812): lowest interface below the
    # parcel top with d(slv)/CP > critjump caps the mixed layer
    critjump = 2.0
    dslv = (slv[:-1] - slv[1:]) / CP           # edge e=1..npz-1 at kidx 1..
    kcond = jnp.concatenate(
        [jnp.zeros_like(dslv[:1], dtype=bool),
         dslv > critjump], axis=0)             # layer-k aligned (k>=1)
    kcond = kcond & (kidx >= ipbl[None] + 1)
    any_int = jnp.any(kcond, axis=0)
    k_int = (npz - 1) - jnp.argmax(kcond[::-1], axis=0).astype(jnp.int32)
    ipbl = jnp.where(any_int, k_int, ipbl)
    zsml = jnp.where(any_int, _take_k(zhalf, ipbl), zsml)

    zsml_s = jnp.where(conv, zsml, 1.0)
    slv_t = _take_k(slv, jnp.maximum(ipbl - 1, 0))
    slv_i = _take_k(slv, ipbl)
    zf_t = _take_k(zfull, jnp.maximum(ipbl - 1, 0))
    zf_i = _take_k(zfull, ipbl)

    vsurf3 = jnp.maximum(u_star * b_star * zsml_s, 0.0)
    vshear3 = ASHEAR * u_star ** 3
    vsurf = vsurf3 ** (1.0 / 3.0)
    tmp1 = GRAV * jnp.maximum(0.1, (slv_t - slv_i) / CP) / (slv_i / CP)
    tmp2 = ((vsurf3 + vshear3) ** (2.0 / 3.0)) / zsml_s
    wentr = jnp.minimum(
        WENTRMAX,
        jnp.maximum(0.0, (p["beta_surf"] * (vsurf3 + vshear3) / zsml_s)
                    / (tmp1 + tmp2)))
    wentr = jnp.where(zsml_s < 1600.0, wentr * (zsml_s / 800.0), 2.0 * wentr)
    k_entr = jnp.minimum(wentr * (zf_t - zf_i), AKMAX)

    # diffusivity_pbl2 (:1255-1300) on the interior of the mixed layer
    kfacx = jnp.where(frland < 0.5, p["khsfcfac"], 2.0 * p["khsfcfac"])
    vh = jnp.maximum(vsurf * zsml_s, 1e-30)
    ee = 1.0 - jnp.sqrt(jnp.maximum(k_entr, 0.0) / (kfacx * KARMAN * vh))
    ee = jnp.maximum(ee, 0.7)
    zm = zhalf[:npz]                            # slots s=0..npz-1
    in_ml = (zm <= zsml_s[None]) & (zm > 0.0) & (vh[None] > 0.0)
    k_troen = kfacx[None] * KARMAN * vsurf[None] * zm \
        * (1.0 - ee[None] * (zm / zsml_s[None])) ** 2
    k_troen = jnp.where(in_ml, k_troen, 0.0)

    slot = kidx                                 # slot s aligned with zhalf[s]
    troen_slots = (slot >= ipbl[None] + 1)
    k_t_entr = jnp.where(troen_slots, k_troen, 0.0)
    k_m_entr = jnp.where(troen_slots, k_troen * p["prandtlsfc"], 0.0)
    at_ipbl = slot == ipbl[None]
    k_t_entr = k_t_entr + jnp.where(at_ipbl, k_entr[None], 0.0)
    k_m_entr = k_m_entr + jnp.where(at_ipbl, k_entr[None], 0.0)

    convk = conv[None]
    k_t_entr = jnp.where(convk, k_t_entr, 0.0)
    k_m_entr = jnp.where(convk, k_m_entr, 0.0)

    if p.get("radlw_dep", 0) == 1:
        density = pfull / (RGAS * t * (1.0 + VIREPS * qv - qc))
        if tdtlw is None:
            tdtlw = jnp.zeros_like(t)
        k_sfc = jnp.where(conv, k_entr, 0.0)
        p_rad = dict(p, _vsurf3=jnp.where(conv, vsurf3, 0.0),
                     _vshear3=vshear3)
        k_t_entr, k_m_entr = _lock_rad(
            t, qv, qc, hleff, slv, zfull, pfull, phalf_e,
            zhalf, density, ipbl, jnp.where(conv, zsml_s, 0.0), conv,
            k_sfc, k_t_entr, k_m_entr, p_rad, tdtlw)

    # merge: diff = max(k_entr, diff) on interior slots 1..npz-1 (:1078-1083)
    interior = (slot >= 1)
    kh_new = kh.at[:npz].set(
        jnp.where(interior, jnp.maximum(k_t_entr, kh[:npz]), kh[:npz]))
    km_new = km.at[:npz].set(
        jnp.where(interior, jnp.maximum(k_m_entr, km[:npz]), km[:npz]))
    return kh_new, km_new


def _tridiag_setup(zfull, rdz, dmi, phalf, tv, ct, cq, cm, kh, km, p, dt):
    """bldriver.F90:504-610: assemble the implicit-diffusion tridiagonals
    and re-diagnose ZPBL.  Returns (aks..ckv dict, zpbl)."""
    npz = zfull.shape[0]
    kidx = jnp.arange(npz).reshape((npz,) + (1,) * (zfull.ndim - 1))

    # ZPBL: lowest layer L where diff_t crosses 2.0 going up (:564-574)
    cond = (kh[:npz] < 2.0) & (kh[1:npz + 1] >= 2.0) & (kidx >= 1)
    anyc = jnp.any(cond, axis=0)
    lsel = (npz - 1) - jnp.argmax(cond[::-1], axis=0).astype(jnp.int32)
    zpbl = jnp.where(anyc, _take_k(zfull, lsel), zfull[npz - 1])
    zpbl = jnp.minimum(zpbl, zfull[p["kpblmin"] - 1])

    z = jnp.zeros_like(zfull[:1])

    # scalars (heat): interior flux coefficients from kh edges 1..npz-1
    cks_raw = -kh[1:npz] * rdz                  # (npz-1, S)
    aks = jnp.concatenate([z, cks_raw * dmi[1:]], axis=0)
    cks = jnp.concatenate([cks_raw * dmi[:-1], -ct[None] * dmi[-1:]], axis=0)
    akq = aks
    ckq = jnp.concatenate([cks_raw * dmi[:-1], -cq[None] * dmi[-1:]], axis=0)
    # winds
    ekv_raw = -km[1:npz] * rdz
    akv = jnp.concatenate([z, ekv_raw * dmi[1:]], axis=0)
    ckv = jnp.concatenate([ekv_raw * dmi[:-1], -cm[None] * dmi[-1:]], axis=0)

    bks = 1.0 - (aks + cks)
    bkq = 1.0 - (akq + ckq)
    bkv = 1.0 - (akv + ckv)
    return dict(aks=aks, bks=bks, cks=cks, akq=akq, bkq=bkq, ckq=ckq,
                akv=akv, bkv=bkv, ckv=ckv), zpbl


def _orodrag(bkv, u, v, zfull, varflt, phalf, p, dt):
    """bldriver.F90:612-655: Beljaars (2003) orographic form drag into the
    wind main diagonal."""
    lam = p["lambda_b"]
    act = zfull < 4.0 * lam
    fz = jnp.where(act, zfull / lam, 1.0)
    fkv = varflt[None] * jnp.exp(-fz * jnp.sqrt(fz)) * fz ** (-1.2)
    fkv = (p["c_b"] / lam) * jnp.minimum(jnp.sqrt(u ** 2 + v ** 2), 5.0) * fkv
    fkv = jnp.where(act, fkv, 0.0)
    return bkv + dt * fkv


def bl_driver(u, v, th, q, phalf, qit, qlt, frland, frocean, varflt,
              zpbl, cm, ct, cq, ustar, bstar, params, dt, tdtlw=None):
    """BL_DRIVER (bldriver.F90:23-295): returns the LU-ready tridiagonal
    coefficient dict {aks..ckv} plus the updated zpbl diagnostic.

    All inputs are trajectory fields; th is virtual-free potential
    temperature p00^kappa * T / pkz as prepared by the turbulence driver
    (fv3jedi_lm_turbulence_mod.F90:448)."""
    pf = 0.5 * (phalf[:-1] + phalf[1:])
    pif = (pf / P00) ** (RGAS / CP)
    t = pif * th

    zfull, zhalf, tv, pv, rdz, dmi = _preliminary(t, q, phalf, th, qit, qlt, dt)
    kh, km = _louis_diff(zpbl, zfull, zhalf, pv, u, v, params)
    if params["lock_on"]:
        kh, km = _lock_diff(t, q, qit, qlt, u, v, zfull, pf, zhalf, frland,
                            ustar, bstar, kh, km, params,
                            tdtlw=tdtlw, phalf_e=phalf)
    coeffs, zpbl_new = _tridiag_setup(zfull, rdz, dmi, phalf, tv, ct, cq, cm,
                                      kh, km, params, dt)
    coeffs["bkv"] = _orodrag(coeffs["bkv"], u, v, zfull, varflt, phalf,
                             params, dt)
    return coeffs, zpbl_new
