"""Turbulence (frozen-K boundary-layer diffusion) gates:

* vtrilu + vtrisolve solves the tridiagonal system exactly (vs dense solve);
* TL/AD dot product through dynamics + turbulence < 1e-12 (VERDICT r2 #4);
* the NL physics step applies the same frozen operator as the TL (the
  reference step_nl literally runs the TL solver on the trajectory,
  fv3jedi_lm_turbulence_mod.F90:151-215).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D
from fv3jedi_lm_tpu.physics.turbulence import vtrilu, vtrisolve


def test_tridiag_solver_exact():
    rng = np.random.default_rng(0)
    lm_ = 17
    ncol = 5
    a = jnp.asarray(rng.uniform(-0.3, 0.0, (lm_, ncol)))
    c = jnp.asarray(rng.uniform(-0.3, 0.0, (lm_, ncol)))
    b = 1.0 - (a + c)     # diagonally dominant, as the BL tridiagonals
    y = jnp.asarray(rng.standard_normal((lm_, ncol)))
    al, bl, cl = vtrilu(a, b, c)
    x = vtrisolve(al, bl, cl, y, 1)
    # verify A x = y with the dense matrix
    for j in range(ncol):
        A = np.diag(np.asarray(b[:, j]))
        A += np.diag(np.asarray(a[1:, j]), -1)
        A += np.diag(np.asarray(c[:-1, j]), 1)
        resid = A @ np.asarray(x[:, j]) - np.asarray(y[:, j])
        assert np.abs(resid).max() < 1e-12


@pytest.fixture(scope="module")
def lm():
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=10, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3, d2_bg_k1_pert=0.2,
                      d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1),
        dt=450.0, do_phy_trb=True,
    )
    return LinearModel.create(cfg)


@pytest.fixture(scope="module")
def traj(lm):
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    rng = np.random.default_rng(3)
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    faces = np.arange(6)[:, None, None]
    ks = np.arange(npz)[:, None, None, None]
    bump = (3.0 * np.sin(2.0 * np.pi * (jj + 0.5) / n + 0.7 * faces)
            * np.cos(2.0 * np.pi * (ii + 0.5) / n + 0.3 * faces)
            * np.cos(0.5 * np.pi * ks / npz))
    tr["t"] = tr["t"] + jnp.asarray(bump)
    tr["qv"] = tr["qv"] + 2e-3 * jnp.ones((npz, 6, n, n))
    # nontrivial surface exchange/stability fields
    tr["ustar"] = jnp.asarray(0.2 + 0.1 * rng.random((6, n, n)))
    tr["bstar"] = jnp.asarray(0.02 * rng.standard_normal((6, n, n)))
    tr["cm"] = jnp.asarray(0.01 * rng.random((6, n, n)))
    tr["ct"] = jnp.asarray(0.01 * rng.random((6, n, n)))
    tr["cq"] = jnp.asarray(0.01 * rng.random((6, n, n)))
    tr["frocean"] = jnp.asarray((rng.random((6, n, n)) > 0.3) * 1.0)
    tr["frland"] = 1.0 - tr["frocean"]
    tr["varflt"] = jnp.asarray(100.0 * rng.random((6, n, n)))
    tr["zpbl"] = jnp.asarray(500.0 + 500.0 * rng.random((6, n, n)))
    for _ in range(2):
        tr = lm.step_nl(tr)
    return tr


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in lm.zero_pert().items()}


def _dot(a, b):
    return sum(jnp.vdot(a[k], b[k]) for k in PROG_3D)


def test_dot_product_with_turbulence(lm, traj):
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_physics_changes_the_operator(lm, traj):
    """Turbulence must actually act (coefficients nonzero on this traj)."""
    cks, tapes, _mpack, ltraj = lm._ckpts(traj)
    assert ltraj is not None
    # sub-diagonal of the scalar system is nonzero somewhere (active mixing)
    assert float(jnp.abs(ltraj["aks"]).max()) > 0.0
    dx = _rand_pert(lm, 5)
    with_phys = lm.step_tl(traj, dx)
    p = lm._staged().tl({k: traj[k] for k in PROG_3D}, traj["phis"],
                        dx, cks, tapes)
    diff = sum(float(jnp.abs(with_phys[k] - p[k]).max()) for k in PROG_3D)
    assert diff > 0.0
