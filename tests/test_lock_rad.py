"""Lock PBL cloud-top radiative entrainment (bldriver.F90:852-1075
RADLW_DEP branch + radml_depth :1180-1253).

The reference compiles this branch but hardwires RADLW_DEP=0
(fv3jedi_lm_turbulence_mod.F90:107) because the LW heating rate is not in
its trajectory; here it activates with params['radlw_dep']=1 and a tdtlw
field."""

import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu.constants import CP, GRAV, KAPPA, P00, RGAS
from fv3jedi_lm_tpu.physics.bldriver import (bl_driver, default_turb_params,
                                             _radml_depth)


def _column_setup(npz=30, ncld=None, cool=0.0):
    """Stratocumulus-topped boundary layer on a (6,2,2) grid: cloud water
    in a layer near 900 hPa with optional LW cooling at its top."""
    S = (6, 2, 2)
    pe = np.linspace(2000.0, 1.0e5, npz + 1)
    phalf = np.broadcast_to(pe[:, None, None, None], (npz + 1,) + S).copy()
    pf = 0.5 * (pe[1:] + pe[:-1])
    # near-neutral troposphere on a dry adiabat with a stable inversion at
    # the cloud top
    theta = np.full(npz, 290.0)
    t = theta * (pf / P00) ** KAPPA
    # find layers near 900-950 hPa for the cloud
    kcld = np.where((pf > 9.0e4) & (pf < 9.6e4))[0]
    qlt = np.zeros(npz)
    tdtlw = np.zeros(npz)
    qv = np.full(npz, 8.0e-3)
    if ncld:
        qlt[kcld] = 2.0e-4
        t[:kcld[0]] += 5.0          # inversion above cloud top (stable)
        qv[:kcld[0]] = 1.0e-3       # dry free troposphere: the cloud-top
        # mixture is then negatively buoyant (evaporative cooling), the
        # classic stratocumulus buoyancy-reversal configuration
        tdtlw[kcld[0]] = -abs(cool)
    th = theta[:, None, None, None] * np.ones((1,) + S)
    arr = lambda x: jnp.asarray(np.broadcast_to(
        x[:, None, None, None], (npz,) + S))
    sfc = lambda v: jnp.full(S, v)
    del th
    fields = dict(
        u=arr(np.full(npz, 3.0)), v=arr(np.zeros(npz)),
        th=arr(t * (P00 / pf) ** KAPPA),
        q=arr(qv),
        phalf=jnp.asarray(phalf),
        qit=arr(np.zeros(npz)), qlt=arr(qlt),
        frland=sfc(0.0), frocean=sfc(1.0), varflt=sfc(0.0),
        zpbl=sfc(500.0), cm=sfc(0.01), ct=sfc(0.01), cq=sfc(0.01),
        ustar=sfc(0.2), bstar=sfc(1.0e-3),
    )
    # th must be potential temperature consistent with t
    fields["th"] = arr(t * (P00 / pf) ** KAPPA)
    return fields, jnp.asarray(np.broadcast_to(
        tdtlw[:, None, None, None], (npz,) + S))


def _run(fields, params, tdtlw=None):
    return bl_driver(
        fields["u"], fields["v"], fields["th"], fields["q"],
        fields["phalf"], fields["qit"], fields["qlt"], fields["frland"],
        fields["frocean"], fields["varflt"], fields["zpbl"], fields["cm"],
        fields["ct"], fields["cq"], fields["ustar"], fields["bstar"],
        params, 900.0, tdtlw=tdtlw)


def test_radlw_dep0_default_unchanged():
    """With the reference default radlw_dep=0 the tdtlw field is inert."""
    fields, tdtlw = _column_setup(ncld=True, cool=5e-3)
    pref = np.asarray(fields["phalf"][:, 0, 0, 0])
    p0 = default_turb_params(pref)
    assert p0["radlw_dep"] == 0
    c_a, z_a = _run(fields, p0)
    c_b, z_b = _run(fields, p0, tdtlw=tdtlw)
    for k in c_a:
        assert float(jnp.abs(c_a[k] - c_b[k]).max()) == 0.0


def test_radlw_entrainment_strengthens_mixing():
    """A cloud-topped column with LW cooling gets larger scalar diffusion
    (more negative aks below the cloud top) with radlw_dep=1."""
    fields, tdtlw = _column_setup(ncld=True, cool=5e-3)
    pref = np.asarray(fields["phalf"][:, 0, 0, 0])
    p0 = default_turb_params(pref)
    p1 = dict(p0, radlw_dep=1)
    c0, _ = _run(fields, p0)
    c1, _ = _run(fields, p1, tdtlw=tdtlw)
    for k in c1:
        assert bool(jnp.isfinite(c1[k]).all()), k
    # scalar subdiagonal aks = kh * rdz * dmi (negative of): compare the
    # total interior diffusion strength
    s0 = float(jnp.abs(c0["aks"]).sum())
    s1 = float(jnp.abs(c1["aks"]).sum())
    assert s1 > s0 * 1.0001, (s0, s1)


def test_radlw_no_cloud_no_change():
    fields, tdtlw = _column_setup(ncld=False)
    pref = np.asarray(fields["phalf"][:, 0, 0, 0])
    p1 = dict(default_turb_params(pref), radlw_dep=1)
    c0, _ = _run(fields, default_turb_params(pref))
    c1, _ = _run(fields, p1, tdtlw=tdtlw)
    for k in c0:
        np.testing.assert_allclose(np.asarray(c0[k]), np.asarray(c1[k]),
                                   rtol=0, atol=0)


def test_radml_depth_descent():
    """radml_depth: parcel descends until warmer than environment; zml is
    the distance from cloud top to that base."""
    npz = 20
    S = (4,)
    # environment slv/cp increasing downward (stable below, well-mixed mid)
    z = np.linspace(4000.0, 100.0, npz)
    slvcp = np.where(z > 2000.0, 300.0 + (z - 2000.0) * 0.005, 300.0)
    slvcp = np.where(z < 500.0, 299.0, slvcp)  # warmer (in slv/cp) surface
    slvcp_a = jnp.asarray(np.broadcast_to(slvcp[:, None], (npz,) + S))
    zf = jnp.asarray(np.broadcast_to(z[:, None], (npz,) + S))
    zh = jnp.asarray(np.broadcast_to(
        np.concatenate([z + 100.0, [0.0]])[:, None], (npz + 1,) + S))
    kct = jnp.full(S, 5, jnp.int32)
    zt = zh[5]
    svp = jnp.full(S, 299.5)       # colder than env at kct, warmer than sfc
    zb, zml = _radml_depth(svp, kct, zt, slvcp_a, zf, zh)
    assert bool(jnp.isfinite(zb).all()) and bool(jnp.isfinite(zml).all())
    # base must be below cloud top and above the surface-warm layer
    assert float(zb[0]) < float(zt[0])
    assert float(zml[0]) > 0.0
    np.testing.assert_allclose(np.asarray(zml), np.asarray(zt - zb))
