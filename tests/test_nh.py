"""Nonhydrostatic vertical solver gates (nh_utils_nlm.F90:43-1310).

* SIM1: a hydrostatically balanced, motionless column is (nearly) a fixed
  point — the implied nonhydrostatic pressure perturbation, the updated w
  and the dz change all stay at rounding level;
* SIM1 responds to an initial w impulse by exchanging it with the
  pressure field while conserving column mass-weighted w tendencies;
* jvp/vjp of the solver satisfy the dot-product identity with frozen
  branches (the staged TL/AD discipline extends to the NH path);
* update_dz_c: constant gz stays constant under any winds; monotonicity
  floor respected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.constants import GRAV, KAPPA, RGAS
from fv3jedi_lm_tpu.core import freeze
from fv3jedi_lm_tpu.core.nh_core import (DZ_MIN, riem_solver_c, sim1_solver,
                                         update_dz_c)


def _balanced_column(km=16, b=8, seed=0):
    """Hydrostatically balanced dz for a given (dm, pt) column set."""
    rng = np.random.default_rng(seed)
    ptop = 100.0
    pe = np.zeros((km + 1, b))
    dm = 1.0e5 / km * (1.0 + 0.1 * rng.random((km, b)))
    dm *= 1.0e5 / dm.sum(0)
    pe[0] = ptop
    pe[1:] = ptop + np.cumsum(dm, axis=0)
    pm = dm / np.log(pe[1:] / pe[:-1])
    t = 250.0 + 40.0 * rng.random((km, b))
    # potential-temperature-like variable the solver uses: from
    # pe' = (-dm/dz * R * pt)^gamma - pm = 0  =>  dz = -dm R pt / pm^(1-kappa)
    pt = t  # treat as the solver's pt2 input
    dmg = dm / GRAV
    dz = -dmg * RGAS * pt * pm ** (KAPPA - 1.0)
    return (jnp.asarray(dmg), jnp.asarray(pt), jnp.asarray(pm),
            jnp.asarray(pe), jnp.asarray(dz))


def test_sim1_hydrostatic_fixed_point():
    dm, pt, pm, pem, dz = _balanced_column()
    w = jnp.zeros_like(dm)
    ws = jnp.zeros_like(dm[0])
    pe, w_new, dz_new = sim1_solver(100.0, dm, pt, pm, pem, w, dz, ws,
                                    KAPPA)
    assert float(jnp.abs(pe).max()) < 1e-6 * float(pem[-1].max())
    assert float(jnp.abs(w_new).max()) < 1e-8
    assert float(jnp.abs((dz_new - dz) / dz).max()) < 1e-10


def test_sim1_w_impulse_damped_and_finite():
    dm, pt, pm, pem, dz = _balanced_column(seed=3)
    rng = np.random.default_rng(4)
    w = jnp.asarray(1.0 * rng.standard_normal(dm.shape))
    ws = jnp.zeros_like(dm[0])
    pe, w_new, dz_new = sim1_solver(100.0, dm, pt, pm, pem, w, dz, ws,
                                    KAPPA)
    for x in (pe, w_new, dz_new):
        assert bool(jnp.isfinite(x).all())
    # the implicit solve removes energy from w (sound waves radiated into
    # the pressure field): column w variance must not grow
    assert float(jnp.sum(dm * w_new ** 2)) <= float(jnp.sum(dm * w ** 2))
    # dz stays negative (layered atmosphere) and above the p_fac floor
    assert float(dz_new.max()) < 0.0


def test_sim1_dot_product():
    dm, pt, pm, pem, dz = _balanced_column(seed=5)
    rng = np.random.default_rng(6)
    w = jnp.asarray(0.5 * rng.standard_normal(dm.shape))
    ws = jnp.zeros_like(dm[0])

    def f(x):
        pe, w2, dz2 = sim1_solver(100.0, dm, pt, pm, pem, x["w"], x["dz"],
                                  ws, KAPPA)
        return dict(pe=pe, w=w2, dz=dz2)

    x0 = dict(w=w, dz=dz)
    with freeze.recording() as tape:
        f(x0)
    tape = list(tape)
    dx = {k: jnp.asarray(rng.standard_normal(v.shape)) * (1e-2 if k == "w"
                                                          else 1e-1)
          for k, v in x0.items()}
    with freeze.replaying(tape):
        _, dy = jax.jvp(f, (x0,), (dx,))
    with freeze.replaying(tape):
        _, pull = jax.vjp(f, x0)
    ct = {k: jnp.asarray(rng.standard_normal(v.shape))
          for k, v in dy.items()}
    xb = pull(ct)[0]
    lhs = sum(float(jnp.vdot(dy[k], ct[k])) for k in dy)
    rhs = sum(float(jnp.vdot(dx[k], xb[k])) for k in dx)
    assert abs(lhs - rhs) / max(abs(lhs), 1e-300) < 1e-12, (lhs, rhs)


def test_riem_solver_c_hydrostatic_consistency():
    """With w = 0 and balanced gz, the full edge pressure equals the
    hydrostatic pem and gz is reproduced."""
    km, n = 12, 8
    jc = n + 6
    rng = np.random.default_rng(7)
    ptop = 100.0
    dp_prof = (1.0e5 - ptop) / km * np.ones(km)
    delp = jnp.asarray(np.broadcast_to(
        dp_prof[:, None, None, None], (km, 6, jc, jc)).copy()
        * (1.0 + 0.02 * rng.random((km, 6, jc, jc))))
    pe = ptop + jnp.concatenate(
        [jnp.zeros((1, 6, jc, jc)), jnp.cumsum(delp, 0)], 0)
    pm = delp / jnp.log(pe[1:] / pe[:-1])
    t = jnp.asarray(250.0 + 30.0 * rng.random((km, 6, jc, jc)))
    dmg = delp / GRAV
    dz = -dmg * RGAS * t * pm ** (KAPPA - 1.0)
    hs = jnp.zeros((6, jc, jc))
    # INPUT gz is height in meters (from update_dz); OUTPUT is height*grav
    # (Riem_Solver_c's unit convention, nh_utils_nlm.F90:362,396-402)
    gz_m = jnp.concatenate(
        [hs[None] - jnp.cumsum(dz[::-1], 0)[::-1], hs[None]], 0)
    w3 = jnp.zeros_like(delp)
    ws = jnp.zeros((6, jc, jc))
    pef, gz_new, w_new = riem_solver_c(50.0, KAPPA, ptop, hs, w3, t, delp,
                                       gz_m, ws)
    np.testing.assert_allclose(np.asarray(pef), np.asarray(pe), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gz_new),
                               np.asarray(gz_m) * GRAV, rtol=1e-6,
                               atol=1e-3)
    assert float(jnp.abs(w_new).max()) < 1e-8


def test_update_dz_c_constant_gz_and_floor():
    from fv3jedi_lm_tpu.lm import LinearModel
    from fv3jedi_lm_tpu.config import DynConfig, LMConfig

    cfg = LMConfig(dyn=DynConfig(npx=9, npy=9, npz=8, n_split=1,
                                 k_split=1), dt=300.0)
    lm = LinearModel.create(cfg)
    km, n = 8, 8
    jc = n + 6
    jb = jc + 1
    rng = np.random.default_rng(8)
    ut = jnp.asarray(1e3 * rng.standard_normal((km, 6, jc, jb)))
    vt = jnp.asarray(1e3 * rng.standard_normal((km, 6, jb, jc)))
    dp0 = np.linspace(800.0, 1500.0, km)
    # constant-per-interface gz: upwind advection of a constant is exact
    levels = np.linspace(3.0e4, 0.0, km + 1)
    gz = jnp.asarray(np.broadcast_to(
        levels[:, None, None, None], (km + 1, 6, jc, jc)).copy())
    zs = jnp.zeros((6, jc, jc))
    gz_new, ws = update_dz_c(300.0, dp0, zs, ut, vt, gz, lm.grid, lm.topo,
                             9)
    inner = slice(1, jc - 1)
    got = np.asarray(gz_new[:, :, inner, inner])
    want = np.broadcast_to(levels[:, None, None, None], got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-7)
    # monotonicity floor holds everywhere
    d = np.asarray(gz_new[:-1] - gz_new[1:])
    assert d.min() >= DZ_MIN - 1e-9
    assert bool(np.isfinite(np.asarray(ws)).all())


def test_edge_profile_constant():
    from fv3jedi_lm_tpu.core.nh_core import edge_profile
    km, b = 12, 5
    dp0 = np.linspace(500.0, 1800.0, km)
    q = jnp.full((km, b), 3.75)
    qe = edge_profile(q, dp0)
    np.testing.assert_allclose(np.asarray(qe), 3.75, rtol=1e-12)


def test_riem_solver3_hydrostatic_fixed_point():
    from fv3jedi_lm_tpu.core.nh_core import riem_solver3
    km, n = 12, 8
    jc = n + 6
    rng = np.random.default_rng(9)
    ptop = 100.0
    delp = jnp.asarray((1.0e5 - ptop) / km * (
        1.0 + 0.02 * rng.random((km, 6, jc, jc))))
    pe = ptop + jnp.concatenate(
        [jnp.zeros((1, 6, jc, jc)), jnp.cumsum(delp, 0)], 0)
    pm = delp / jnp.log(pe[1:] / pe[:-1])
    t = jnp.asarray(250.0 + 30.0 * rng.random((km, 6, jc, jc)))
    dmg = delp / GRAV
    dz = -dmg * RGAS * t * pm ** (KAPPA - 1.0)
    zs = jnp.zeros((6, jc, jc))
    zh = jnp.concatenate(
        [zs[None] - jnp.cumsum(dz[::-1], 0)[::-1], zs[None]], 0)
    w = jnp.zeros_like(delp)
    ws = jnp.zeros((6, jc, jc))
    out = riem_solver3(60.0, KAPPA, ptop, zs, ws, None, t, delp, zh, w)
    assert float(jnp.abs(out["w"]).max()) < 1e-8
    np.testing.assert_allclose(np.asarray(out["zh"]), np.asarray(zh),
                               rtol=1e-8, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["ppe"]), np.asarray(pe),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pk3"]),
                               np.asarray(pe) ** KAPPA, rtol=1e-10)


def test_update_dz_d_constant_zh():
    from fv3jedi_lm_tpu.core.nh_core import update_dz_d
    from fv3jedi_lm_tpu.lm import LinearModel
    from fv3jedi_lm_tpu.config import DynConfig, LMConfig

    cfg = LMConfig(dyn=DynConfig(npx=9, npy=9, npz=8, n_split=1,
                                 k_split=1), dt=300.0)
    lm = LinearModel.create(cfg)
    km, n = 8, 8
    jc = n + 6
    rng = np.random.default_rng(10)
    crx = jnp.asarray(0.2 * rng.standard_normal((km, 6, jc, n + 1)))
    cry = jnp.asarray(0.2 * rng.standard_normal((km, 6, n + 1, jc)))
    xfx = jnp.asarray(1e7 * rng.standard_normal((km, 6, jc, n + 1)))
    yfx = jnp.asarray(1e7 * rng.standard_normal((km, 6, n + 1, jc)))
    dp0 = np.linspace(800.0, 1500.0, km)
    levels = np.linspace(3.0e4, 0.0, km + 1)
    zh = jnp.asarray(np.broadcast_to(
        levels[:, None, None, None], (km + 1, 6, jc, jc)).copy())
    zs = jnp.zeros((6, jc, jc))
    zh_new, ws = update_dz_d(300.0, dp0, zs, zh, crx, cry, xfx, yfx, 1,
                             lm.grid, lm.topo, 9)
    cs = slice(3, jc - 3)
    got = np.asarray(zh_new[:, :, cs, cs])
    want = np.broadcast_to(levels[:, None, None, None], got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-6)
    assert bool(np.isfinite(np.asarray(ws)).all())
