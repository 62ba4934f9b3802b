"""Regression gate for the round-2 BIG-sentinel adjoint-NaN defect.

The grid stores sentinel values in undefined halo/corner metric lanes
(reference big_number, model/fv_grid_utils_nlm.F90:49).  The compute path
must be structurally masked so that NO differentiated op ever consumes a
sentinel in a way that can produce NaN — which means the adjoint must be
finite and the dot-product identity must hold for ANY sentinel magnitude.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D


def _spun_up(lm):
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    faces = np.arange(6)[:, None, None]
    ks = np.arange(npz)[:, None, None, None]
    bump = (
        3.0
        * np.sin(2.0 * np.pi * (jj + 0.5) / n + 0.7 * faces)
        * np.cos(2.0 * np.pi * (ii + 0.5) / n + 0.3 * faces)
        * np.cos(0.5 * np.pi * ks / npz)
    )
    tr["t"] = tr["t"] + jnp.asarray(bump)
    for _ in range(2):
        tr = lm.step_nl(tr)
    return tr


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    p = lm.zero_pert()
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in p.items()}


@pytest.mark.parametrize("big", [1.0e8, 1.0e30])
def test_adjoint_finite_and_dual_for_any_sentinel(big):
    cfg = LMConfig(
        dyn=DynConfig(npx=13, npy=13, npz=5, n_split=2, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2),
        dt=450.0,
    )
    lm = LinearModel.create(cfg, big=big)
    traj = _spun_up(lm)
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    for k in PROG_3D:
        assert bool(jnp.isfinite(mtdy[k]).all()), (big, k)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in PROG_3D))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in PROG_3D))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-300) < 1e-12, (big, lhs, rhs)


def test_f32_default_sentinel_is_safe():
    """Users need no `big=` plumbing in float32: the default sentinel is
    dtype-aware (VERDICT r3 item 9) and the TL/AD stay finite/dual."""
    cfg = LMConfig(
        dyn=DynConfig(npx=13, npy=13, npz=5, n_split=2, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      dtype="float32"),
        dt=450.0,
    )
    lm = LinearModel.create(cfg)
    traj = _spun_up(lm)
    dx = _rand_pert(lm, 3)
    dy = _rand_pert(lm, 4)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    for k in PROG_3D:
        assert bool(jnp.isfinite(mdx[k]).all()), ("tl", k)
        assert bool(jnp.isfinite(mtdy[k]).all()), ("ad", k)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in PROG_3D))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in PROG_3D))
    # f32 arithmetic: the identity holds to f32 rounding of the sums
    assert abs(lhs - rhs) / max(abs(lhs), 1e-300) < 5e-5, (lhs, rhs)
