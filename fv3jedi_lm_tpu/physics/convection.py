"""RAS (Relaxed Arakawa-Schubert) convection, whole-array TPU form.

Re-derivation of the reference GEOS RAS scheme
(src/physics/moist/convection.F90: RASE:10-660, RASE0:834-1357, ACRITN:662,
SUNDQ3_ICE:694, DQSAT_RAS/DQSATs_RAS:705-833) used by the linearized moist
physics.  The reference runs one Fortran column at a time inside an (i,j)
loop with a downward cloud-type loop DO IC=K,ICMIN+1,-1 full of early
CYCLE exits; here every column of the cube runs at once:

* columns are the trailing axis — all arrays are (K0, B) / (K0+1, B);
* the cloud-type loop is a `freeze.fscan` over IC (so every
  trajectory-dependent branch decision inside is recorded to / replayed
  from the tape, keeping the TLM and ADM exact transposes);
* the CYCLE exits become per-column accept masks applied to the updates;
* the truly sequential in-cloud condensate recurrence (WLQ/CLL0/CLOSS,
  convection.F90:437-489) is an inner level `fscan`;
* every other K..IC recurrence (ZET, HCC, HCLD via eta-weighted form,
  BKE/BK2, TX2) is a masked reversed cumulative sum — one XLA op instead
  of a level loop.

The scheme is differentiable end-to-end; the moist driver takes jvp / vjp
of it at the stored trajectory with the branch tape frozen (the reference's
Tapenade rase_d / rase_b pair, convection_tl.F90 / convection_ad.F90).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.freeze import (fbool, fint, fmax, fmin, fscan, fwhere)
from .qsat import dqsat

ONEPKAP = 1.0 + 2.0 / 7.0
DAYLEN = 86400.0
RHMAX = 0.9999
CBL_QPERT = 0.0
CBL_TPERT = 1.0
CBL_TPERT_MXOCN = 2.0
CBL_TPERT_MXLND = 4.0

#: ACRITN tables (convection.F90:662-692)
ACRIT_PH = np.array([150.0, 200.0, 250.0, 300.0, 350.0, 400.0, 450.0, 500.0,
                     550.0, 600.0, 650.0, 700.0, 750.0, 800.0, 850.0])
ACRIT_A = np.array([1.6851, 1.1686, 0.7663, 0.5255, 0.4100, 0.3677,
                    0.3151, 0.2216, 0.1521, 0.1082, 0.0750, 0.0664,
                    0.0553, 0.0445, 0.0633])


def default_rasparams(npx: int) -> np.ndarray:
    """RASPARAMS(1:25) (fv3jedi_lm_moist_mod.F90:122-149); imsize = 4*im."""
    p = np.zeros(25)
    p[0] = 1.000
    p[1] = 0.05
    p[3] = 8.0e-4
    p[4] = 1800.0
    p[5] = 43200.0
    p[6] = -300.0
    p[7] = 4.0
    p[9] = 200.0
    p[10] = 7.5e-4
    p[11] = 1.0
    p[12] = -1.0
    p[13] = 1.3
    p[14] = 1.3
    p[15] = 263.0
    p[16] = 0.5
    p[17] = 1.0
    p[19] = 0.1
    p[20] = 0.8
    p[21] = 1.0
    imsize = (npx - 1) * 4
    p[22] = (4000.0 if imsize <= 200 else 2000.0 if imsize <= 400
             else 700.0 if imsize <= 800 else 450.0)
    p[23] = 0.5
    p[24] = 0.65
    return p


def sundq3_ice(temp, rate2, rate3, te1):
    """Ice-phase autoconversion factors (convection.F90:694-703)."""
    te0 = 273.0
    te2 = 200.0
    jump1 = (rate2 - 1.0) / (te0 - te1) ** 0.333
    # guard: grad of x**1/3 blows up at x==0 (the unselected-branch-NaN
    # pitfall of where-grads), so feed the power a strictly positive arg
    dtp = jnp.maximum(te0 - temp, 1.0e-12)
    f2_mid = 1.0 + jump1 * dtp ** 0.3333
    f2_low = rate2 + (rate3 - rate2) * (te1 - temp) / (te1 - te2)
    f2 = fwhere(temp >= te0, jnp.ones_like(temp),
                fwhere(temp >= te1, f2_mid, f2_low))
    f2 = fmin(f2, 27.0)
    return f2, jnp.ones_like(temp)


def acritn(pl, plb, acritfac):
    """Critical cloud work function (convection.F90:662-692).

    pl/plb are pressure-only (hPa) — never differentiated in the LM."""
    iwk = jnp.floor(pl * 0.02 - 0.999999999).astype(jnp.int32)
    iwk = fint(iwk)
    ph = jnp.asarray(ACRIT_PH)
    a = jnp.asarray(ACRIT_A)
    lo = jnp.clip(iwk - 2, 0, 13)           # A(IWK-1) 0-based
    interp = a[lo] + (pl - ph[lo]) * 0.02 * (a[lo + 1] - a[lo])
    acr = jnp.where(iwk > 15, a[14], jnp.where(iwk > 1, interp, a[0]))
    return acritfac * acr * (plb - pl)


def _revcs(x):
    """revcs(x)[l] = sum_{l'>=l} x[l'] along the level axis."""
    return jnp.cumsum(x[::-1], axis=0)[::-1]


def safediv(a, b, eps=1.0e-6):
    """a / b with |b| clamped away from zero, sign preserved.

    An exact `where(b != 0, b, 1)` guard is NOT vjp-safe: a denominator of
    1e-300 passes it, and the cotangent -ct*a/b**2 then overflows to inf,
    which a downstream masked-out lane turns into 0*inf = NaN.  All call
    sites here only *use* lanes where |b| is physically O(eps) or larger —
    the clamp changes rejected/masked lanes only."""
    mag = jnp.maximum(jnp.abs(b), eps)
    return a / jnp.where(b < 0, -mag, mag)


def _at(arr, idx):
    """Per-column gather: arr (L, B), idx (B,) -> (B,)."""
    return jnp.take_along_axis(arr, idx[None, :], axis=0)[0]


def rase(dt, icmin, sige, kcbl, wgt0, wgt1, frland, ts,
         tho, qho, uho, vho, co_auto, ple, rasparams, seedras, estblx=None,
         with_winds=True):
    """RASE (convection.F90:10-660) / RASE0 (with_winds=False, :834-1357).

    Shapes: tho/qho/uho/vho/wgt0/wgt1 (K0, B); ple/sige (K0+1, B)/(K0+1,);
    kcbl int (B,) 1-based Fortran cloud-base level (0 = no convection);
    ts/frland/co_auto/seedras (B,).  ple in hPa (the driver's CNV_PLE).
    Returns (tho, qho, uho, vho, clw, flxd, cnv_prc3, cnv_updfrc).
    """
    from ..constants import (MAPL_AIRMW, MAPL_ALHL, MAPL_CP, MAPL_GRAV,
                             MAPL_H2OMW, MAPL_KAPPA, MAPL_RGAS, MAPL_VIREPS)

    k0, b = tho.shape
    dtype = tho.dtype
    fricfac = float(rasparams[0])
    cli_crit = float(rasparams[3])
    rasal1 = float(rasparams[4])
    rasal2 = float(rasparams[5])
    friclambda = float(rasparams[10])
    sdqv2, sdqv3, sdqvt1 = (float(rasparams[13]), float(rasparams[14]),
                            float(rasparams[15]))
    acritfac = float(rasparams[16])
    pblfrac = float(rasparams[19])
    autorampb = float(rasparams[20])
    rhmn = float(rasparams[23])
    maxdallowed = float(rasparams[22])
    rhmx = float(rasparams[24])

    grav, cp, alhl = MAPL_GRAV, MAPL_CP, MAPL_ALHL
    cpi, alhi, gravi = 1.0 / cp, 1.0 / alhl, 1.0 / grav
    cpbg = cp * gravi
    ddt = DAYLEN / dt
    lbcp = alhl * cpi

    lv = jnp.arange(k0)[:, None]           # python level index (0 = top)
    act0 = kcbl > 0
    # inactive columns (kcbl == 0) get a well-formed substitute cloud base:
    # their outputs are fully masked by act0, but the strapped-pressure
    # geometry at kcbl=0 is degenerate (PRS(1) overwritten by PRCBL) and its
    # infs would poison the vjp through 0*inf lanes
    k_i = jnp.clip(jnp.where(act0, kcbl, k0) - 1, 0, k0 - 1)
    kcbl = jnp.where(act0, kcbl, k0)
    ic_lo = icmin - 1                       # python index of ICMIN

    # --- pressures, heights, CBL perturbation (convection.F90:184-231) ----
    pke = (ple / 1000.0) ** MAPL_KAPPA                      # (K0+1, B)
    pf = 0.5 * (ple[:-1] + ple[1:])
    pkf = (pf / 1000.0) ** MAPL_KAPPA
    tempf = tho * pkf
    thv = tho * (1.0 + MAPL_VIREPS * qho)
    czle = (cp / grav) * (pke[1:] - pke[:-1]) * thv         # full-layer dz
    czlo = (cp / grav) * (pke[1:] - pkf) * thv              # half-layer dz
    zle = _revcs(czle)                                       # ZLE(L), L=0..K0-1
    zle1 = jnp.concatenate([zle[1:], jnp.zeros((1, b), dtype)], axis=0)
    zlo = zle1 + czlo

    tpert = fmax(CBL_TPERT * (ts - (tempf[-1] + grav * zlo[-1] * cpi)), 0.0)
    tpert = jnp.where(frland < 0.1, fmin(tpert, CBL_TPERT_MXOCN),
                      fmin(tpert, CBL_TPERT_MXLND))
    qpert = jnp.zeros_like(tpert)           # CBL_QPERT = 0

    dqs, qss = dqsat(tempf, pf * 100.0, estblx)

    # --- strapped sub-cloud superlayer (convection.F90:232-268) -----------
    prcbl = _at(ple, k_i) + jnp.sum(
        jnp.where(lv >= k_i, wgt0 * (ple[1:] - ple[:-1]), 0.0), axis=0)
    put = jnp.arange(k0 + 1)[:, None] == kcbl[None, :]
    prs = jnp.where(put, prcbl[None, :], ple)
    prj = jnp.where(put, (prcbl[None, :] / 1000.0) ** MAPL_KAPPA, pke)

    pol = 0.5 * (prs[:-1] + prs[1:])
    # NOTE: with the strapped pressure PRS(K+1)=PRCBL, the layers BELOW the
    # cloud base can have zero/negative thickness (e.g. K=K0-1 makes
    # PRS(K+1) the surface pressure, so dprs[K]=0).  The reference never
    # indexes those lanes (its loops stop at K); here they exist but are
    # masked everywhere, so clamp the divisions (vjp-safe, see safediv).
    dprs = prs[1:] - prs[:-1]
    prh = safediv(prs[1:] * prj[1:] - prs[:-1] * prj[:-1], ONEPKAP * dprs)
    pki = safediv(jnp.ones_like(prh), prh)
    dpt = prh - prj[:-1]
    dpb = prj[1:] - prh
    pri = safediv(0.01 * jnp.ones_like(prh), dprs)

    wbase = _at(prs[1:], k_i) - _at(prs, k_i)               # PRS(K+1)-PRS(K)
    wght = safediv(jnp.where(lv >= k_i, wgt0 * (ple[1:] - ple[:-1]), 0.0),
                   wbase)
    poi_k = jnp.sum(wght * tho, axis=0)
    qoi_k = jnp.sum(wght * qho, axis=0)
    uoi_k = jnp.sum(wght * uho, axis=0)
    voi_k = jnp.sum(wght * vho, axis=0)

    at_k = lv == k_i
    poi = jnp.where(at_k, poi_k[None, :], tho)
    qoi = jnp.where(at_k, qoi_k[None, :], qho)
    uoi = jnp.where(at_k, uoi_k[None, :], uho)
    voi = jnp.where(at_k, voi_k[None, :], vho)

    dq_k, qs_k = dqsat(poi_k * _at(prh, k_i), _at(pol, k_i) * 100.0, estblx)
    qst = jnp.where(at_k, qs_k[None, :], qss)
    dqq = jnp.where(at_k, dq_k[None, :], dqs)

    rndu = jnp.maximum(seedras.astype(dtype) / 1.0e6, 1.0e-6)
    mxdiam = maxdallowed * rndu ** (-0.5)
    lambda_min = 0.2 / mxdiam               # (B,)
    lambda_max = 0.2 / 200.0

    bet = dqq * pki
    gam = pki / (1.0 + lbcp * dqq)
    gam_m = jnp.concatenate([gam[:1], gam[:-1]], axis=0)     # GAM(L-1)
    dpb_m = jnp.concatenate([dpb[:1], dpb[:-1]], axis=0)
    dqq_m = jnp.concatenate([dqq[:1], dqq[:-1]], axis=0)
    ght = gam_m * dpb_m + gam * dpt                          # GHT(L), L>=IC+1
    gm1 = 0.5 * lbcp * (dqq_m / (alhl * (1.0 + lbcp * dqq_m))
                        + dqq / (alhl * (1.0 + lbcp * dqq)))

    poi_sv_k = poi_k
    qoi_sv_k = qoi_k
    uoi_sv_k = uoi_k
    voi_sv_k = voi_k

    # --- cloud-type loop DO IC=K,ICMIN+1,-1 (convection.F90:316-580) ------
    zeros_kb = jnp.zeros((k0, b), dtype)
    carry0 = dict(poi=poi, qoi=qoi, uoi=uoi, voi=voi, qst=qst,
                  cll=zeros_kb, rmf=zeros_kb, rmfd=zeros_kb, rmfc=zeros_kb,
                  rns=zeros_kb, updfrc=zeros_kb)
    ics = jnp.arange(k0 - 1, ic_lo, -1)     # python ic indices, K0-1 .. icmin

    sige_d = jnp.asarray(sige, dtype)

    def cloud_type(c, ic):
        poi, qoi, uoi, voi, qst = c["poi"], c["qoi"], c["uoi"], c["voi"], c["qst"]
        active = act0 & (ic <= k_i)
        in_cld = (lv >= ic) & (lv <= k_i)   # L in [IC, K]
        above = (lv > ic) & (lv <= k_i)     # L in [IC+1, K]
        mid = (lv > ic) & (lv < k_i)        # L in [IC+1, K-1]

        trg = fmin(1.0, (_at(qoi, k_i) / _at(qst, k_i) - rhmn) / (rhmx - rhmn))
        # SIGE is 0-based over edges (0:K0); Fortran SIGE(IC) = sige[ic+1]
        f4 = jnp.minimum(1.0, jnp.maximum(0.0, (autorampb - sige_d[ic + 1]) / 0.2))
        go = active & fbool(trg > 1.0e-5)

        # sounding recompute with CBL perturbation (convection.F90:337-356)
        poi_c = jnp.where(at_k, poi + tpert[None, :], poi)
        qoi_c = jnp.where(at_k, qoi + qpert[None, :], qoi)
        qol = fmax(0.0, fmin(qst * RHMAX, qoi_c))
        tem_z = jnp.where(lv <= k_i, poi_c * (prj[1:] - prj[:-1]) * cpbg, 0.0)
        zet = _revcs(tem_z)                  # ZET(L); ZET(K+1)=0
        zet1 = jnp.concatenate([zet[1:], jnp.zeros((1, b), dtype)], axis=0)
        ssl = cp * prj[1:] * poi_c + grav * zet1
        hol = ssl + qol * alhl
        hst = ssl + qst * alhl
        zol = zet1 + (prj[1:] - prh) * poi_c * cpbg

        ssl_m = jnp.concatenate([ssl[:1], ssl[:-1]], axis=0)
        qol_m = jnp.concatenate([qol[:1], qol[:-1]], axis=0)
        prh_m = jnp.concatenate([prh[:1], prh[:-1]], axis=0)
        dprh = prh - prh_m
        tem_s = safediv(prj[:-1] - prh_m, dprh, eps=1.0e-10)
        sht = ssl_m + tem_s * (ssl - ssl_m)  # SHT(L), valid L in [IC+1,K]
        qht = 0.5 * (qol + qol_m)

        hol_k = _at(hol, k_i)
        hst_ic = _at(hst, ic * jnp.ones_like(k_i))
        hol_ic = _at(hol, ic * jnp.ones_like(k_i))
        zol_ic = _at(zol, ic * jnp.ones_like(k_i))
        zet_ic1 = _at(zet1, ic * jnp.ones_like(k_i))
        go = go & fbool(hol_k > hst_ic)

        # lambda (MS-A18, convection.F90:367-394)
        tem_l = (hst_ic - hol_ic) * (zol_ic - zet_ic1) + jnp.sum(
            jnp.where(mid, (hst_ic[None, :] - hol) * (zet - zet1), 0.0),
            axis=0)
        go = go & fbool(tem_l > 0.0)
        alm = safediv(hol_k - hst_ic, tem_l)
        go = go & fbool(alm <= lambda_max)
        # zero lambda on rejected lanes so no downstream expression
        # (eta, exp(-alm/friclambda), ...) can reach inf there
        alm = jnp.where(go, alm, 0.0)
        toki = fwhere(alm < lambda_min, (alm / lambda_min) ** 2,
                      jnp.ones_like(alm))

        # eta (MS-A2)
        zet_k = _at(zet, k_i)
        eta = jnp.where(above, 1.0 + alm[None, :] * (zet - zet_k[None, :]), 1.0)
        eta_ic = 1.0 + alm * (zol_ic - zet_k)
        eta = jnp.where(lv == ic, eta_ic[None, :], eta)
        eta1 = jnp.concatenate([eta[1:], jnp.ones((1, b), dtype)], axis=0)
        # deta valid on [IC, K-1]: ETA(L)-ETA(L+1) with ETA(K)=1
        deta = jnp.where((lv >= ic) & (lv < k_i), eta - eta1, 0.0)

        # work function (MS-A22, convection.F90:396-412)
        hcc = hol_k[None, :] + _revcs(jnp.where(mid, deta * hol, 0.0))
        hcc = jnp.where(at_k, hol_k[None, :], hcc)           # HCC(K)=HOL(K)
        hcc1 = jnp.concatenate([hcc[1:], hcc[-1:]], axis=0)
        eht = eta1 * dpb + eta * dpt
        wfn = jnp.sum(jnp.where(
            mid, (hcc1 * dpb + hcc * dpt - eht * hst) * gam, 0.0), axis=0)
        hcc_ic1 = _at(hcc, jnp.minimum(ic + 1, k0 - 1) * jnp.ones_like(k_i))
        eta_ic1 = _at(eta1, ic * jnp.ones_like(k_i))
        gam_ic = _at(gam, ic * jnp.ones_like(k_i))
        dpb_ic = _at(dpb, ic * jnp.ones_like(k_i))
        wfn = wfn + (hcc_ic1 - hst_ic * eta_ic1) * gam_ic * dpb_ic

        # in-cloud moist static energy / vertical velocity (:414-427)
        ycld = hol_k[None, :] + _revcs(
            jnp.where((lv >= ic) & (lv < k_i), deta * hol, 0.0))
        hcld = safediv(ycld, eta)
        tem_b = (hcld - hst) * (zet - zet1) / (1.0 + lbcp * dqq)
        denom_b = cp * prj[1:] * poi
        bk2 = _revcs(jnp.where((lv >= ic) & (lv < k_i),
                               grav * fmax(tem_b, 0.0) / denom_b, 0.0))
        # sqrt-at-zero grad guard; the result is clamped to >= 1 anyway
        cvw = fmax(jnp.sqrt(2.0 * jnp.maximum(fmax(bk2, 0.0), 1.0e-20)), 1.0)

        # alpha / acceptance (:429-436)
        zet_ic = _at(zet, ic * jnp.ones_like(k_i))
        rasal = fwhere(zet_ic < 2000.0, jnp.full_like(zet_ic, rasal1),
                       rasal1 + (rasal2 - rasal1) * (zet_ic - 2000.0) / 8000.0)
        rasal = dt / fmin(rasal, 1.0e5)
        pol_ic = _at(pol, ic * jnp.ones_like(k_i))
        prs_k = _at(prs, k_i)
        acr = acritn(pol_ic, prs_k, acritfac)
        go = go & fbool(wfn > acr)

        # in-cloud condensate recurrence (:437-489) — sequential in L
        qst_m = jnp.concatenate([qst[:1], qst[:-1]], axis=0)
        hst_m = jnp.concatenate([hst[:1], hst[:-1]], axis=0)
        te_a = poi * prh
        f2, f3 = sundq3_ice(te_a, sdqv2, sdqv3, sdqvt1)
        c00_x = co_auto[None, :] * f2 * f3 * f4
        cli_crit_x = cli_crit / (f2 * f3)
        dt_lyr = (zet - zet1) / cvw

        wlq0 = _at(qol, k_i)
        uht0 = _at(uoi, k_i)
        vht0 = _at(voi, k_i)

        seq_xs = dict(qol=qol, uoi=uoi, voi=voi, deta=deta, eta=eta,
                      qst=qst, qst_m=qst_m, hst=hst, hst_m=hst_m, hcc=hcc,
                      gm1=gm1, c00=c00_x, ccx=cli_crit_x, dtl=dt_lyr,
                      m_add=(lv < k_i) & (lv >= ic),       # L in [IC, K-1]
                      m_mid=(lv > ic) & (lv < k_i),        # L in (IC, K-1]
                      m_ic=lv == ic)

        def wlq_body(cc, x):
            wlq, uht, vht = cc
            tem = x["deta"]
            wlq = wlq + jnp.where(x["m_add"], tem * x["qol"], 0.0)
            uht = uht + jnp.where(x["m_add"], tem * x["uoi"], 0.0)
            vht = vht + jnp.where(x["m_add"], tem * x["voi"], 0.0)
            tx2 = 0.5 * (x["qst"] + x["qst_m"]) * x["eta"]
            tx3 = 0.5 * (x["hst"] + x["hst_m"]) * x["eta"]
            qcc = tx2 + x["gm1"] * (x["hcc"] - tx3)
            cll0 = jnp.where(x["m_mid"], wlq - qcc,
                             wlq - qst_ic * eta_ic_v)
            cll0 = fmax(cll0, 0.0)
            cli = safediv(cll0, x["eta"])
            rate = x["c00"] * (1.0 - jnp.exp(-(cli / x["ccx"]) ** 2))
            closs = fmin(cll0 * rate * x["dtl"], cll0)
            cll0 = cll0 - closs
            wlq = wlq - jnp.where(x["m_add"], closs, 0.0)
            rnn = jnp.where(x["m_add"], closs, 0.0)
            return (wlq, uht, vht), (cll0, rnn)

        qst_ic = _at(qst, ic * jnp.ones_like(k_i))
        eta_ic_v = _at(eta, ic * jnp.ones_like(k_i))
        (wlq, uht, vht), (cll0, rnn) = fscan(
            wlq_body, (wlq0, uht0, vht0), seq_xs, reverse=True)

        wlq = wlq - qst_ic * eta_ic_v

        # gammas and kernel (:491-516)
        sht1 = jnp.concatenate([sht[1:], sht[-1:]], axis=0)
        qht1 = jnp.concatenate([qht[1:], qht[-1:]], axis=0)
        gms_mid = (eta * (sht - ssl) + eta1 * (ssl - sht1)) * pri
        gms_k = (sht - ssl) * pri
        gms_ic = eta1 * (ssl - sht1) * pri
        gms = jnp.where(at_k, gms_k, jnp.where(lv == ic, gms_ic, gms_mid))
        gmh_k = gms + (qht - qol) * pri * alhl
        gmh_mid = gms + (eta * (qht - qol) + eta1 * (qol - qht1)) * alhl * pri
        gmh_ic = gms + (eta1 * (qol - qht1) * alhl
                        + eta * (hst - hol)) * pri
        gmh = jnp.where(at_k, gmh_k, jnp.where(lv == ic, gmh_ic, gmh_mid))

        gmh_kv = _at(gmh, k_i)
        gam_km = _at(gam, jnp.maximum(k_i - 1, 0))
        dpb_km = _at(dpb, jnp.maximum(k_i - 1, 0))
        akm0 = gmh_kv * gam_km * dpb_km
        tx2_c = gmh_kv[None, :] + _revcs(jnp.where(mid, deta * gmh, 0.0))
        akm = akm0 + jnp.sum(
            jnp.where(mid, -gms * eht * pki + tx2_c * ght, 0.0), axis=0)
        pki_ic = _at(pki, ic * jnp.ones_like(k_i))
        gms_icv = _at(gms, ic * jnp.ones_like(k_i))
        akm = akm - gms_icv * eta_ic1 * dpb_ic * pki_ic

        go = go & fbool(akm < 0.0) & fbool(wlq >= 0.0)

        # cloud-base mass flux (:518-531)
        wfn2 = -safediv(wfn - acr, akm)
        wfn2 = fmin(rasal * trg * toki * wfn2, wbase * (100.0 * pblfrac))
        wfn2 = jnp.where(go, wfn2, 0.0)
        tem = wfn2 * gravi

        gmask = go[None, :]
        at_ic = lv == ic
        c["cll"] = c["cll"] + jnp.where(gmask & at_ic, wlq * tem, 0.0)
        c["rmf"] = c["rmf"] + jnp.where(gmask & at_ic, tem, 0.0)
        c["rmfd"] = c["rmfd"] + jnp.where(gmask & at_ic, tem * eta_ic_v, 0.0)
        rmfp = tem[None, :] * eta
        c["rmfc"] = c["rmfc"] + jnp.where(gmask & above, rmfp, 0.0)
        updfrp = fwhere(cvw > 0.0,
                        rmfp * (ddt / DAYLEN) * 1000.0 / (cvw * prs[:-1]),
                        jnp.zeros_like(rmfp))
        c["updfrc"] = c["updfrc"] + jnp.where(gmask & above, updfrp, 0.0)

        # theta/q increments for this cloud type (:533-543)
        c["rns"] = c["rns"] + jnp.where(gmask & in_cld, rnn * tem[None, :], 0.0)
        gmh_w = gmh * wfn2[None, :]
        gms_w = gms * wfn2[None, :]
        upd = gmask & in_cld
        qoi = qoi + jnp.where(upd, (gmh_w - gms_w) * alhi, 0.0)
        poi = poi + jnp.where(upd, gms_w * pki * cpi, 0.0)
        qst = qst + jnp.where(upd, gms_w * bet * cpi, 0.0)

        # cumulus friction (:545-570)
        if with_winds and fricfac > 0.0:
            wfn3 = wfn2 * 0.5 * fricfac * jnp.exp(-alm / friclambda)
            uoi_m = jnp.concatenate([uoi[:1], uoi[:-1]], axis=0)
            voi_m = jnp.concatenate([voi[:1], voi[:-1]], axis=0)
            uoi_p = jnp.concatenate([uoi[1:], uoi[-1:]], axis=0)
            voi_p = jnp.concatenate([voi[1:], voi[-1:]], axis=0)
            ucu_k = (uoi_m - uoi)
            vcu_k = (voi_m - voi)
            ucu_mid = (uoi_m - uoi) * eta + (uoi - uoi_p) * eta1
            vcu_mid = (voi_m - voi) * eta + (voi - voi_p) * eta1
            uht_t = 2.0 * (uht - uoi * (eta - eta1)) - (uoi + uoi_p) * eta1
            vht_t = 2.0 * (vht - voi * (eta - eta1)) - (voi + voi_p) * eta1
            ucu = jnp.where(at_k, ucu_k,
                            jnp.where(at_ic, uht_t, ucu_mid)) * pri
            vcu = jnp.where(at_k, vcu_k,
                            jnp.where(at_ic, vht_t, vcu_mid)) * pri
            uoi = uoi + jnp.where(upd, wfn3[None, :] * ucu, 0.0)
            voi = voi + jnp.where(upd, wfn3[None, :] * vcu, 0.0)

        c = dict(c, poi=poi, qoi=qoi, uoi=uoi, voi=voi, qst=qst)
        return c, None

    c, _ = fscan(cloud_type, carry0, ics)
    poi, qoi, uoi, voi = c["poi"], c["qoi"], c["uoi"], c["voi"]

    # --- writeback + de-strapping (convection.F90:582-641) ----------------
    sum_rmf = jnp.sum(jnp.where((lv >= ic_lo) & (lv <= k_i), c["rmf"], 0.0),
                      axis=0)
    did = act0 & fbool(sum_rmf > 0.0)
    dmask = did[None, :]

    core = (lv >= ic_lo) & (lv < k_i)       # L in [ICMIN, K-1]
    cnv_prc3 = jnp.where(dmask & (lv >= ic_lo) & (lv <= k_i),
                         c["rns"] * pri * grav, 0.0)
    tho_out = jnp.where(dmask & core, poi, tho)
    qho_out = jnp.where(dmask & core, qoi, qho)
    uho_out = jnp.where(dmask & core, uoi, uho)
    vho_out = jnp.where(dmask & core, voi, vho)
    cnv_updfrc = jnp.where(dmask & core, c["updfrc"], 0.0)

    wsum = jnp.sum(jnp.where(lv >= k_i, wgt1 * (ple[1:] - ple[:-1]), 0.0),
                   axis=0)
    wght1 = wgt1 * safediv(wbase, wsum)
    strap = dmask & (lv >= k_i)
    tho_out = tho_out + jnp.where(strap, wght1 * (_at(poi, k_i) - poi_sv_k), 0.0)
    qho_out = qho_out + jnp.where(strap, wght1 * (_at(qoi, k_i) - qoi_sv_k), 0.0)
    uho_out = uho_out + jnp.where(strap, wght1 * (_at(uoi, k_i) - uoi_sv_k), 0.0)
    vho_out = vho_out + jnp.where(strap, wght1 * (_at(voi, k_i) - voi_sv_k), 0.0)

    flxd = jnp.where(dmask & core, c["rmfd"] * ddt / DAYLEN, 0.0)
    clw = jnp.where(dmask & core, c["cll"] * ddt / DAYLEN, 0.0)

    return tho_out, qho_out, uho_out, vho_out, clw, flxd, cnv_prc3, cnv_updfrc
