"""Energy-conserving remap (consv_te) + reproducible g_sum gates
(VERDICT r3 item 10; fv_mapz_nlm.F90:633-785, fv_grid_utils_nlm.F90:2873).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D
from fv3jedi_lm_tpu.ops.reductions import g_sum

DYN_KW = dict(npx=13, npy=13, npz=10, n_split=2, k_split=1,
              d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3, n_sponge_pert=4,
              d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1)


def test_g_sum_reproducible_vs_fsum():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((6, 12, 12)) * np.logspace(-6, 6, 864).reshape(
        6, 12, 12)
    area = 1.0 + rng.random((6, 12, 12))
    import math
    exact = math.fsum((p * area).reshape(-1).tolist())
    got = float(g_sum(jnp.asarray(p), jnp.asarray(area)))
    assert abs(got - exact) <= 2 * abs(exact) * np.finfo(np.float64).eps
    mean = float(g_sum(jnp.asarray(p), jnp.asarray(area), mode=1))
    assert abs(mean - exact / math.fsum(area.reshape(-1).tolist())) < 1e-12


def _global_te(lm, tr):
    """Independent global total energy of a trajectory state."""
    from fv3jedi_lm_tpu.core.fv_dynamics import total_energy_hydro
    from fv3jedi_lm_tpu.core.fv_pressure import compute_fv3_pressures
    from fv3jedi_lm_tpu.constants import KAPPA, ZVIR
    from fv3jedi_lm_tpu import NG

    st, q = lm._pad({k: tr[k] for k in lm.prog_3d})
    st["phis"] = lm._pad_phis(tr["phis"])
    pe, peln, _, _ = compute_fv3_pressures(st["delp"], KAPPA, lm.ptop)
    tv = st["pt"] * (1.0 + ZVIR * q[0])
    te = total_energy_hydro(st["u"], st["v"], tv, st["delp"], pe, peln,
                            st["phis"], lm.grid, lm.cfg.dyn.npx)
    n = lm.cfg.dyn.nx
    cs = slice(NG, NG + n)
    return float(g_sum(te, lm.grid["area"][..., cs, cs]))


def _spun(lm):
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
    for _ in range(2):
        tr = lm.step_nl(tr)
    return tr


def test_consv_te_reduces_energy_drift():
    lm0 = LinearModel.create(
        LMConfig(dyn=DynConfig(**DYN_KW), dt=450.0))
    lm1 = LinearModel.create(
        LMConfig(dyn=DynConfig(**DYN_KW, consv_te=1.0), dt=450.0))
    tr = _spun(lm0)
    te_in = _global_te(lm0, tr)
    drift0 = abs(_global_te(lm0, lm0.step_nl(tr)) - te_in)
    drift1 = abs(_global_te(lm1, lm1.step_nl(tr)) - te_in)
    # the correction restores the global integral (up to the hydrostatic
    # linearization of dtmp): at least an order of magnitude less drift
    assert drift1 < 0.2 * drift0, (drift0, drift1)


def test_dot_product_with_consv_te():
    lm = LinearModel.create(
        LMConfig(dyn=DynConfig(**DYN_KW, consv_te=1.0), dt=450.0))
    tr = _spun(lm)
    rng = np.random.default_rng(1)
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
    assert abs(lhs - rhs) / abs(lhs) < 1e-12, (lhs, rhs)
