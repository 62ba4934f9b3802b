"""Reference-derived oracle for the ls_cloud PDF condensation scheme.

Independent straight-line scalar transcription of cloud.F90 ls_cloud
(:1104-1350) with its helpers pdffrac flag 1 (:1352-1378),
pdfcondensate flag 1 (:1427-1461), get_ice_fraction (:1880-1905) and
DQSATs_BAC (:2528-2587, identical formula to the DQSAT_RAS oracle in
test_physics_oracle.py), asserted against the production whole-array
`fv3jedi_lm_tpu.physics.cloud.ls_cloud` on random columns.  This breaks
the self-referential golden loop for the cloud scheme's load-bearing
kernel: a consistent sign/indexing error between the production NLM and
TLM would still fail here.
"""

import numpy as np

import jax.numpy as jnp

from fv3jedi_lm_tpu.constants import (MAPL_ALHF, MAPL_ALHL, MAPL_ALHS,
                                      MAPL_CP, MAPL_TICE)
from fv3jedi_lm_tpu.physics.cloud import cloud_params, ls_cloud
from fv3jedi_lm_tpu.physics.qsat import ESTBLX

from test_physics_oracle import oracle_dqsat_ras

T_ICE_ALL = MAPL_TICE - 40.0
T_ICE_MAX = MAPL_TICE
ICEFRPWR = 4


def oracle_ice_fraction(temp):
    """cloud.F90:1880-1905."""
    if temp <= T_ICE_ALL:
        f = 1.0
    elif temp <= T_ICE_MAX:
        f = 1.0 - (temp - T_ICE_ALL) / (T_ICE_MAX - T_ICE_ALL)
    else:
        f = 0.0
    return min(max(f, 0.0), 1.0) ** ICEFRPWR


def oracle_pdffrac_tophat(qtmean, sigmaqt1, qstar):
    """cloud.F90:1352-1378, flag 1 (flags 3/4 share the same primal)."""
    if qtmean + sigmaqt1 < qstar:
        return 0.0
    if sigmaqt1 > 0.0:
        return min(qtmean + sigmaqt1 - qstar, 2.0 * sigmaqt1) / (2.0 * sigmaqt1)
    return 1.0


def oracle_pdfcondensate_tophat(qtmean, sigmaqt1, qstar):
    """cloud.F90:1427-1461, flag 1."""
    if qtmean + sigmaqt1 < qstar:
        return 0.0
    if qstar > qtmean - sigmaqt1:
        if sigmaqt1 > 0.0:
            return min(qtmean + sigmaqt1 - qstar, 2.0 * sigmaqt1) ** 2 / (
                4.0 * sigmaqt1)
        return qtmean - qstar
    return qtmean - qstar


def oracle_ls_cloud(dt, alpha, pl, te, qv, qcl, qal, qci, qai, cf, af,
                    estblx):
    """cloud.F90:1104-1350, PDFSHAPE=1, single n=1 iteration, scalar."""
    qc = qcl + qci
    qa = qal + qai
    teo = te
    dqsx, qsx = oracle_dqsat_ras(teo, pl, estblx)

    if af < 1.0:
        tmparr = 1.0 / (1.0 - af)
    else:
        tmparr = 0.0
    cfx = cf * tmparr
    qcx = qc * tmparr
    qvx = (qv - qsx * af) * tmparr
    if af >= 1.0:
        qvx = qsx * 1.0e-4
    qax = qa / af if af > 0.0 else 0.0
    qt = qcx + qvx

    qsn = qsx
    ten = teo
    qvn = qvx
    qcn = qcx
    dqs = dqsx

    # single iteration n=1 (cloud.F90:1196-1257)
    qsp = qsn
    qvp = qvn
    qcp = qcn
    tep = ten
    fqi = oracle_ice_fraction(tep)
    sigmaqt1 = alpha * qsn

    cfn = oracle_pdffrac_tophat(qt, sigmaqt1, qsn)
    qcn = oracle_pdfcondensate_tophat(qt, sigmaqt1, qsn)

    qao = qax if af > 0.0 else 0.0

    alhx = (1.0 - fqi) * MAPL_ALHL + fqi * MAPL_ALHS
    qcn = qcp + (qcn - qcp) / (
        1.0 - (cfn * (alpha - 1.0) - qcn / qsn) * dqs * alhx / MAPL_CP)
    qvn = qvp - (qcn - qcp)
    ten = (tep
           + (1.0 - fqi) * (MAPL_ALHL / MAPL_CP)
           * ((qcn - qcp) * (1.0 - af) + (qao - qax) * af)
           + fqi * (MAPL_ALHS / MAPL_CP)
           * ((qcn - qcp) * (1.0 - af) + (qao - qax) * af))

    cfo = cfn
    cf = cfn
    qco = qcn
    teo = ten

    if af < 1.0:
        cf = cfo * (1.0 - af)
        qco = qco * (1.0 - af)
        qao = qao * af
    else:
        cf = 0.0
        qao = qa + qc
        qco = 0.0
        qt = qao + qv
        qao = max(qt - qsx, 0.0)

    qcx = qco - qc
    dqcl = (1.0 - fqi) * qcx
    dqci = fqi * qcx
    if qcl + dqcl < 0.0:
        dqci = dqci + (qcl + dqcl)
        dqcl = -qcl
    if qci + dqci < 0.0:
        dqcl = dqcl + (qci + dqci)
        dqci = -qci

    qax = qao - qa
    dqal = qax
    dqai = 0.0
    if qal + dqal < 0.0:
        dqai = dqai + (qal + dqal)
        dqal = -qal
    if qai + dqai < 0.0:
        dqal = dqal + (qai + dqai)
        dqai = -qai

    if af < 1.0e-5:
        dqai = -qai
        dqal = -qal
    if cf < 1.0e-5:
        dqci = -qci
        dqcl = -qcl

    qai = qai + dqai
    qal = qal + dqal
    qci = qci + dqci
    qcl = qcl + dqcl
    qv = qv - (dqai + dqci + dqal + dqcl)
    te = te + (MAPL_ALHL * (dqai + dqci + dqal + dqcl)
               + MAPL_ALHF * (dqai + dqci)) / MAPL_CP

    if qao <= 0.0:
        qv = qv + qai + qal
        te = te - (MAPL_ALHS / MAPL_CP) * qai - (MAPL_ALHL / MAPL_CP) * qal
        qai = 0.0
        qal = 0.0
        af = 0.0

    return te, qv, qcl, qal, qci, qai, cf, af


def _random_columns(npz=16, nb=48, seed=11):
    rng = np.random.default_rng(seed)
    ks = np.arange(npz)[:, None] / (npz - 1.0)
    ph = 80.0 + 920.0 * ks * np.ones((npz, nb))
    te = 205.0 + 95.0 * ks + 3.0 * rng.standard_normal((npz, nb))
    qv = np.clip(0.017 * np.exp(-4.0 * (1.0 - ks))
                 * (1.0 + 0.4 * rng.standard_normal((npz, nb))), 1e-8, None)
    prof = np.exp(-0.5 * ((ks - 0.7) / 0.15) ** 2)
    qcl = 5e-5 * prof * rng.random((npz, nb))
    qal = 4e-5 * prof * rng.random((npz, nb))
    qci = 3e-5 * prof * rng.random((npz, nb))
    qai = 2e-5 * prof * rng.random((npz, nb))
    cf = 0.3 * prof * rng.random((npz, nb))
    af = 0.2 * prof * rng.random((npz, nb))
    # exercise the edge branches: saturated anvil boxes, tiny fractions
    af[-2, :6] = 1.0
    af[-3, 6:12] = 0.5e-5
    cf[-3, 12:18] = 0.5e-5
    qal[-4, 18:24] = 0.0
    qai[-4, 18:24] = 0.0
    alpha = np.clip(0.05 + 0.2 * rng.random((npz, nb)), 0.02, 0.3)
    return ph, te, qv, qcl, qal, qci, qai, cf, af, alpha


def test_ls_cloud_matches_oracle():
    dt = 450.0
    pars = cloud_params(32)
    ph, te, qv, qcl, qal, qci, qai, cf, af, alpha = _random_columns()
    estblx = np.asarray(ESTBLX)

    got = ls_cloud(dt, jnp.asarray(alpha), jnp.asarray(ph), jnp.asarray(te),
                   jnp.asarray(qv), jnp.asarray(qcl), jnp.asarray(qal),
                   jnp.asarray(qci), jnp.asarray(qai), jnp.asarray(cf),
                   jnp.asarray(af), pars, jnp.asarray(estblx), False)
    got = [np.asarray(g) for g in got]

    names = ("te", "qv", "qcl", "qal", "qci", "qai", "cf", "af")
    npz, nb = te.shape
    for k in range(npz):
        for b in range(nb):
            want = oracle_ls_cloud(
                dt, alpha[k, b], ph[k, b], te[k, b], qv[k, b], qcl[k, b],
                qal[k, b], qci[k, b], qai[k, b], cf[k, b], af[k, b], estblx)
            for nm, g, w in zip(names, (x[k, b] for x in got), want):
                np.testing.assert_allclose(
                    g, w, rtol=1e-11, atol=1e-14,
                    err_msg=f"{nm} at k={k} b={b}")
