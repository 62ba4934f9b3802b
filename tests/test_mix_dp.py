"""mix_dp gates: thin-layer delp mixing (dyn_core_nlm.F90:1875-1952, call
site :697 behind flagstruct%fill_dp).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.core.dyn_core import mix_dp
from fv3jedi_lm_tpu.lm import LinearModel

DYN_KW = dict(npx=13, npy=13, npz=10, n_split=2, k_split=1,
              d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3,
              n_sponge_pert=4, d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.1,
              d2_bg_ks_pert=0.1, fill_dp=True)


def _dp_ref(npz, ptop=100.0, ps=1.0e5):
    pe = np.linspace(ptop, ps, npz + 1)
    return pe[1:] - pe[:-1]


def test_mix_dp_noop_on_healthy_columns():
    npz = 8
    dp_ref = _dp_ref(npz)
    delp = jnp.asarray(dp_ref)[:, None, None, None] * jnp.ones((1, 6, 4, 4))
    pt = 280.0 + jnp.arange(npz, dtype=jnp.float64)[:, None, None, None] \
        * jnp.ones((1, 6, 4, 4))
    d2, t2, _ = mix_dp(delp, pt, None, dp_ref, True)
    assert float(jnp.abs(d2 - delp).max()) == 0.0
    assert float(jnp.abs(t2 - pt).max()) == 0.0


def test_mix_dp_thin_layer_conservation():
    """A layer below dpmin is topped up from below; column mass and
    column-integrated pt*delp are conserved; output delp >= dpmin."""
    npz = 8
    dp_ref = _dp_ref(npz)
    rng = np.random.default_rng(0)
    delp = dp_ref[:, None, None, None] * np.ones((1, 6, 4, 4))
    pt = 280.0 + rng.standard_normal((npz, 6, 4, 4))
    # thin layer 3 to 0.1% of reference, and the bottom layer too (the
    # bottom borrows from above)
    delp[3] *= 0.001
    delp[-1] *= 0.001
    w = rng.standard_normal((npz, 6, 4, 4))
    d2, t2, w2 = mix_dp(jnp.asarray(delp), jnp.asarray(pt), jnp.asarray(w),
                        dp_ref, False)
    dpmin = 0.01 * dp_ref
    assert float((np.asarray(d2) - dpmin[:, None, None, None]).min()) >= -1e-12
    # conservation
    np.testing.assert_allclose(np.asarray(d2).sum(0), delp.sum(0), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(t2 * d2).sum(0), (pt * delp).sum(0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w2 * d2).sum(0), (w * delp).sum(0),
                               rtol=1e-12)


@pytest.fixture(scope="module")
def lm():
    return LinearModel.create(LMConfig(dyn=DynConfig(**DYN_KW), dt=450.0))


@pytest.fixture(scope="module")
def traj(lm):
    """Trajectory with a deliberately thinned layer so mix_dp is active."""
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    faces = np.arange(6)[:, None, None]
    bump = 3.0 * np.sin(2 * np.pi * (jj + 0.5) / n + 0.7 * faces) \
        * np.cos(2 * np.pi * (ii + 0.5) / n + 0.3 * faces)
    tr["t"] = tr["t"] + jnp.asarray(bump)[None] * jnp.ones((npz, 1, 1, 1))
    # thin layer 4 in a patch of columns to 0.2% of its reference thickness
    delp = np.asarray(tr["delp"]).copy()
    delp[4, :, 3:6, 3:6] *= 0.002
    tr["delp"] = jnp.asarray(delp)
    tr = lm.step_nl(tr)
    return tr


def test_mix_dp_e2e_stability(lm, traj):
    out = lm.step_nl(traj)
    for k in lm.prog_3d:
        assert bool(jnp.isfinite(out[k]).all()), k


def test_mix_dp_e2e_dot_product(lm, traj):
    """TL/AD duality with mix_dp active on the executed path (frozen
    mixing decisions replayed identically in TL and AD)."""
    rng = np.random.default_rng(1)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    dx = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    dy = {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
          for k, v in lm.zero_pert().items()}
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    lhs = float(sum(jnp.vdot(mdx[k], dy[k]) for k in lm.prog_3d))
    rhs = float(sum(jnp.vdot(dx[k], mtdy[k]) for k in lm.prog_3d))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)
