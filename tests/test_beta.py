"""beta>0 off-centered pressure-gradient gates (grad1_p_update,
dyn_core_nlm.F90:1781-1872; split_p_grad :1531-1641; dispatch :864-880;
beta_d it==1 reset :367-374).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel

BASE_KW = dict(npx=13, npy=13, npz=10, k_split=1,
               d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3,
               n_sponge_pert=4, d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.1,
               d2_bg_ks_pert=0.1)


def _spun(lm, nsteps=2):
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    faces = np.arange(6)[:, None, None]
    ks = np.arange(npz)[:, None, None, None]
    bump = (3.0 * np.sin(2 * np.pi * (jj + 0.5) / n + 0.7 * faces)
            * np.cos(2 * np.pi * (ii + 0.5) / n + 0.3 * faces)
            * np.cos(0.5 * np.pi * ks / npz))
    tr["t"] = tr["t"] + jnp.asarray(bump)
    for _ in range(nsteps):
        tr = lm.step_nl(tr)
    return tr


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7, w=0.1, delz=1.0)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in lm.zero_pert().items()}


def _dp_check(lm, traj):
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in lm.prog_3d))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in lm.prog_3d))
    return abs(lhs - rhs) / max(abs(lhs), 1e-300)


def test_beta_nsplit1_matches_beta0():
    """With n_split=1 every substep is the first (beta_d=0), so the beta
    path must reproduce the beta=0 one_grad_p step exactly."""
    lm0 = LinearModel.create(
        LMConfig(dyn=DynConfig(**BASE_KW, n_split=1, beta=0.0), dt=450.0))
    lmb = LinearModel.create(
        LMConfig(dyn=DynConfig(**BASE_KW, n_split=1, beta=0.4), dt=450.0))
    tr = _spun(lm0, nsteps=1)
    o0 = lm0.step_nl(tr)
    ob = lmb.step_nl(tr)
    for k in lm0.prog_3d:
        a, b = np.asarray(o0[k]), np.asarray(ob[k])
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-13, k


@pytest.mark.parametrize("hydro", [True, False],
                         ids=["hydro-grad1_p_update", "nh-split_p_grad"])
def test_beta_stability_and_dot_product(hydro):
    lm = LinearModel.create(
        LMConfig(dyn=DynConfig(**BASE_KW, n_split=2, beta=0.4,
                               hydrostatic=hydro), dt=450.0))
    traj = _spun(lm)
    out = lm.step_nl(traj)
    for k in lm.prog_3d:
        assert bool(jnp.isfinite(out[k]).all()), k
    rel = _dp_check(lm, traj)
    assert rel < 1e-12, rel


def test_beta_changes_the_answer():
    """beta=0.4 with n_split>1 must differ from beta=0 (the off-centering
    is real), while staying close (same continuum operator)."""
    lm0 = LinearModel.create(
        LMConfig(dyn=DynConfig(**BASE_KW, n_split=2, beta=0.0), dt=450.0))
    lmb = LinearModel.create(
        LMConfig(dyn=DynConfig(**BASE_KW, n_split=2, beta=0.4), dt=450.0))
    tr = _spun(lm0, nsteps=1)
    o0 = lm0.step_nl(tr)
    ob = lmb.step_nl(tr)
    du = np.abs(np.asarray(o0["u"]) - np.asarray(ob["u"])).max()
    assert du > 1e-12
    assert du < 1.0
