"""Window (4D-Var inner-loop) driver gates (SURVEY 3.5, VERDICT r2 item 6):

* nt-step window TL/AD dot-product identity;
* run_ad is the exact reverse composition of run_tl's per-step operators.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D


@pytest.fixture(scope="module")
def lm():
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=6, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3, d2_bg_k1_pert=0.2,
                      d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1),
        dt=450.0, nt=4, saveltraj=True,
    )
    return LinearModel.create(cfg)


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in lm.zero_pert().items()}


def _dot(a, b):
    return sum(jnp.vdot(a[k], b[k]) for k in PROG_3D)


def test_window_dot_product(lm):
    tr = lm.rest_traj()
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    faces = np.arange(6)[:, None, None]
    ks = np.arange(npz)[:, None, None, None]
    bump = (3.0 * np.sin(2.0 * np.pi * (jj + 0.5) / n + 0.7 * faces)
            * np.cos(2.0 * np.pi * (ii + 0.5) / n + 0.3 * faces)
            * np.cos(0.5 * np.pi * ks / npz))
    tr["t"] = tr["t"] + jnp.asarray(bump)

    trajs = lm.run_nl(tr)
    assert len(trajs) == lm.cfg.nt + 1

    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.run_tl(trajs, dx)
    mtdy = lm.run_ad(trajs, dy)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)

    # saveltraj: all nt per-step linearizations stay cached
    assert len(lm._traj_cache) == lm.cfg.nt


@pytest.fixture(scope="module")
def lm_phys():
    """The full 4D-Var inner-loop configuration: dynamics + moist
    (convection + cloud) + turbulence composed over an nt=2 window with
    saveltraj (VERDICT r3 item 7)."""
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=12, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3, d2_bg_k1_pert=0.2,
                      d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1),
        dt=450.0, nt=2, saveltraj=True, do_phy_trb=True, do_phy_mst=1,
    )
    from fv3jedi_lm_tpu.grid.eta import subsample_ak_bk
    ak, bk = subsample_ak_bk(12, 48)
    return LinearModel.create(cfg, ak=ak, bk=bk)


def test_window_with_full_physics(lm_phys):
    """nt=2 window dot product with do_phy_trb + do_phy_mst on."""
    lm = lm_phys
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    rng = np.random.default_rng(7)
    tr = lm.rest_traj(t0=285.0)
    ks = np.arange(npz)[:, None, None, None]
    tr["t"] = jnp.asarray(
        228.0 + 70.0 * (ks / (npz - 1.0)) ** 1.2
        + 1.5 * rng.standard_normal((npz, 6, n, n)))
    qv = 0.016 * np.exp(-3.0 * (1.0 - ks / (npz - 1.0)))
    tr["qv"] = jnp.clip(jnp.asarray(
        qv * (1.0 + 0.2 * rng.standard_normal((npz, 6, n, n)))), 1e-7, None)
    tr["ts"] = jnp.asarray(303.0 + rng.standard_normal((6, n, n)))
    tr["frland"] = jnp.asarray((rng.random((6, n, n)) > 0.5) * 1.0)
    tr["kcbl"] = jnp.full((6, n, n), float(npz - 1))
    prof = np.exp(-0.5 * ((ks - 0.7 * npz) / (0.15 * npz)) ** 2)
    tr["qls"] = jnp.asarray(4e-5 * prof * np.ones((npz, 6, n, n)))
    tr["qcn"] = jnp.asarray(3e-5 * prof * np.ones((npz, 6, n, n)))
    tr["cfcn"] = jnp.asarray(0.1 * prof * np.ones((npz, 6, n, n)))

    trajs = lm.run_nl(tr)
    for k in lm.prog_3d:
        assert bool(jnp.isfinite(trajs[-1][k]).all()), k

    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7, cfcn=1e-3)
    def rp(seed):
        r2 = np.random.default_rng(seed)
        return {k: jnp.asarray(r2.standard_normal(v.shape)) * scale[k]
                for k, v in lm.zero_pert().items()}

    dx, dy = rp(1), rp(2)
    mdx = lm.run_tl(trajs, dx)
    mtdy = lm.run_ad(trajs, dy)

    def dot(a, b):
        return sum(jnp.vdot(a[k], b[k]) for k in lm.prog_3d)

    lhs = float(dot(mdx, dy))
    rhs = float(dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)
    # all nt per-step linearizations (incl. physics ltraj) stayed cached
    assert len(lm._traj_cache) == lm.cfg.nt
