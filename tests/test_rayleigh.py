"""Rayleigh_Super sponge friction (fv_dynamics_nlm.F90:770-937):

* with tau > 0 the top-sponge winds are damped and the lost KE returns as
  heat; below the rf_cutoff band the operator is unchanged;
* tau = 0 keeps the step bitwise identical (flag actually gates the code);
* the TL/AD dot product still holds with Rayleigh active.
"""

import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D


def _cfg(tau):
    return LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=8, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      tau=tau, rf_cutoff=50.0e2),
        dt=450.0,
    )


def _traj(lm, seed=3):
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    rng = np.random.default_rng(seed)
    tr["u"] = tr["u"] + 5.0 * jnp.asarray(
        rng.standard_normal((npz, 6, n + 1, n)))
    tr["v"] = tr["v"] + 5.0 * jnp.asarray(
        rng.standard_normal((npz, 6, n, n + 1)))
    return tr


def test_rayleigh_damps_sponge_winds():
    lm0 = LinearModel.create(_cfg(0.0))
    lm1 = LinearModel.create(_cfg(5.0))
    tr = _traj(lm0)
    o0 = lm0.step_nl(tr)
    o1 = lm1.step_nl(tr)
    du = np.asarray(jnp.abs(o1["u"] - o0["u"]).max(axis=(1, 2, 3)))
    # top levels damped, lower levels untouched by the sponge
    assert du[0] > 0.0
    assert du[-1] == 0.0
    # heating accompanies the damping on the sponge levels
    dt_ = np.asarray(jnp.abs(o1["t"] - o0["t"]).max(axis=(1, 2, 3)))
    assert dt_[0] > 0.0
    # KE at the top level decreased
    ke0 = float(jnp.sum(o0["u"][0] ** 2) + jnp.sum(o0["v"][0] ** 2))
    ke1 = float(jnp.sum(o1["u"][0] ** 2) + jnp.sum(o1["v"][0] ** 2))
    assert ke1 < ke0


def test_rayleigh_dot_product():
    lm = LinearModel.create(_cfg(5.0))
    tr = _traj(lm, 5)
    rng = np.random.default_rng(11)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    dx = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    dy = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    mdx = lm.step_tl(tr, dx)
    mtdy = lm.step_ad(tr, dy)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in PROG_3D))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in PROG_3D))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_rayleigh_friction_variant():
    """Rayleigh_Friction (fv_dynamics_nlm.F90:940-1076, the grid_type>=4
    dispatch): velocity-dependent drag + frictional heating on the sponge
    levels, and the TL/AD dot product holds through it."""
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=8, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      tau=5.0, rf_cutoff=50.0e2, grid_type=4),
        dt=450.0,
    )
    lm = LinearModel.create(cfg)
    tr = _traj(lm, 7)
    out = lm.step_nl(tr)
    for k in PROG_3D:
        assert bool(jnp.isfinite(out[k]).all()), k
    # drag reduced top-level KE vs the undamped variant
    lm0 = LinearModel.create(
        LMConfig(dyn=cfg.dyn.replace(tau=0.0), dt=450.0))
    out0 = lm0.step_nl(tr)
    ke1 = float(jnp.sum(out["u"][0] ** 2) + jnp.sum(out["v"][0] ** 2))
    ke0 = float(jnp.sum(out0["u"][0] ** 2) + jnp.sum(out0["v"][0] ** 2))
    assert ke1 < ke0
    rng = np.random.default_rng(13)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    dx = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    dy = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    mdx = lm.step_tl(tr, dx)
    mtdy = lm.step_ad(tr, dy)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in PROG_3D))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in PROG_3D))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-300) < 1e-12, (lhs, rhs)


def test_rayleigh_fast_inline():
    """Rayleigh_fast (dyn_core_nlm.F90:2219-2287, HIWPP inline drag):
    per-acoustic-substep multiplicative damping of the sponge winds."""
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=8, n_split=2, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      tau=5.0, rf_cutoff=50.0e2, rayleigh_fast=True),
        dt=450.0,
    )
    lm = LinearModel.create(cfg)
    lm_ref = LinearModel.create(
        LMConfig(dyn=cfg.dyn.replace(rayleigh_fast=False), dt=450.0))
    tr = _traj(lm, 9)
    out = lm.step_nl(tr)
    out_ref = lm_ref.step_nl(tr)
    for k in PROG_3D:
        assert bool(jnp.isfinite(out[k]).all()), k
    # the inline drag damps the top-level winds beyond Rayleigh_Super alone
    ke1 = float(jnp.sum(out["u"][0] ** 2) + jnp.sum(out["v"][0] ** 2))
    ke0 = float(jnp.sum(out_ref["u"][0] ** 2) + jnp.sum(out_ref["v"][0] ** 2))
    assert ke1 < ke0
