"""Reference-derived oracles for the moist-physics helper kernels:
independent straight-line transcriptions of convection.F90 ACRITN
(:640-668), SUNDQ3_ICE (:670-703) and DQSAT_RAS (:705-771), asserted
against the production vectorized ops."""

import numpy as np

from fv3jedi_lm_tpu.physics.convection import acritn, sundq3_ice
from fv3jedi_lm_tpu.physics.qsat import ESTBLX, dqsat

PH = [150.0, 200.0, 250.0, 300.0, 350.0, 400.0, 450.0, 500.0,
      550.0, 600.0, 650.0, 700.0, 750.0, 800.0, 850.0]
A = [1.6851, 1.1686, 0.7663, 0.5255, 0.4100, 0.3677,
     0.3151, 0.2216, 0.1521, 0.1082, 0.0750, 0.0664,
     0.0553, 0.0445, 0.0633]


def oracle_acritn(pl, plb, acritfac):
    """convection.F90:640-668 (1-based Fortran table indices)."""
    iwk = int(pl * 0.02 - 0.999999999)
    if 1 < iwk <= 15:
        acr = A[iwk - 2] + (pl - PH[iwk - 2]) * 0.02 * (A[iwk - 1] - A[iwk - 2])
    elif iwk > 15:
        acr = A[14]
    else:
        acr = A[0]
    return acritfac * acr * (plb - pl)


def test_acritn_matches_oracle():
    rng = np.random.default_rng(0)
    pls = np.concatenate([rng.uniform(60.0, 900.0, 200),
                          np.array([100.0, 151.0, 849.0, 880.0])])
    plbs = pls + rng.uniform(5.0, 60.0, pls.size)
    got = np.asarray(acritn(pls, plbs, 0.5))
    want = np.array([oracle_acritn(p, pb, 0.5) for p, pb in zip(pls, plbs)])
    np.testing.assert_allclose(got, want, rtol=1e-13)


def oracle_sundq3(temp, rate2, rate3, te1):
    """convection.F90:670-703."""
    te0, te2 = 273.0, 200.0
    jump1 = (rate2 - 1.0) / ((te0 - te1) ** 0.333)
    if temp >= te0:
        f2 = 1.0
    elif temp >= te1:
        f2 = 1.0 + jump1 * ((te0 - temp) ** 0.3333)
    else:
        f2 = rate2 + (rate3 - rate2) * (te1 - temp) / (te1 - te2)
    if f2 > 27.0:
        f2 = 27.0
    return f2, 1.0


def test_sundq3_matches_oracle():
    rng = np.random.default_rng(1)
    temps = np.concatenate([rng.uniform(180.0, 300.0, 200),
                            np.array([273.0, 258.0, 200.0])])
    rate2, rate3, te1 = 1.3, 2.0, 258.0
    f2_g, f3_g = map(np.asarray, sundq3_ice(temps, rate2, rate3, te1))
    for i, t in enumerate(temps):
        f2_o, f3_o = oracle_sundq3(t, rate2, rate3, te1)
        np.testing.assert_allclose(f2_g[i], f2_o, rtol=1e-13,
                                   err_msg=f"T={t}")
        np.testing.assert_allclose(f3_g[i], f3_o, rtol=0)


def oracle_dqsat_ras(temp, plo_hpa, estblx):
    """convection.F90:705-771 (ESTBLX 1-based; esfac from MAPL consts)."""
    from fv3jedi_lm_tpu.physics.qsat import ESFAC

    degsubs, tmin, tmax = 100, 150.0, 333.0
    pp = plo_hpa * 100.0
    ti = min(max(temp, tmin), tmax - 0.001)
    tt = (ti - tmin) * degsubs + 1
    it = int(tt)
    dqq = estblx[it] - estblx[it - 1]       # ESTBLX(IT+1)-ESTBLX(IT), 0-based
    qq = (tt - it) * dqq + estblx[it - 1]
    if pp <= qq:
        return 0.0, 1.0
    dd = 1.0 / (pp - (1.0 - ESFAC) * qq)
    return (ESFAC * degsubs) * dqq * pp * dd * dd, ESFAC * qq * dd


def test_dqsat_matches_oracle():
    rng = np.random.default_rng(2)
    temps = np.concatenate([rng.uniform(150.0, 340.0, 300),
                            np.array([150.0, 333.0, 332.999])])
    plo = rng.uniform(10.0, 1050.0, temps.size)  # hPa
    tbl = np.asarray(ESTBLX)
    dq_g, qs_g = map(np.asarray, dqsat(temps, plo * 100.0))
    for i in range(temps.size):
        dq_o, qs_o = oracle_dqsat_ras(temps[i], plo[i], tbl)
        np.testing.assert_allclose(dq_g[i], dq_o, rtol=1e-12,
                                   err_msg=f"dq T={temps[i]}")
        np.testing.assert_allclose(qs_g[i], qs_o, rtol=1e-12,
                                   err_msg=f"qs T={temps[i]}")
