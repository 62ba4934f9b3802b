"""Production-depth sponge-band configuration gate (VERDICT r4 weak #6:
every other test runs npz<=12 with shallow sponges; a bug that only
manifests with the real n_sponge=9 band structure — spanning the k1/k2/ks
specials AND a multi-level ks band — would escape them).

npz=24 with n_sponge=9 / n_sponge_pert=9 exercises: the d2_bg_k1/k2
special levels, the k_sponge2/k_sponge3 isolated traj specials inside the
band (mixed static-split path in d_sw's divergence damping), the 8-level
pert-sponge hord override band, and the pert damping cascade."""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel

# d2_bg_k1/k2 at production-namelist magnitudes (~0.2): the reference
# applies the k=1 special with NO 0.2 cap (max(0.01,d2_bg,d2_bg_k1),
# dyn_core_nlm.F90:604) so its Fortran DEFAULT of 4.0 is explosively
# unstable for an explicit del-2 — real configurations set ~0.15-0.2.
KW = dict(npx=13, npy=13, npz=24, n_split=2, k_split=1,
          n_sponge=9, d2_bg_k1=0.2, d2_bg_k2=0.12,
          n_sponge_pert=9, d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.12,
          d2_bg_ks_pert=0.06)


@pytest.fixture(scope="module")
def lm():
    return LinearModel.create(LMConfig(dyn=DynConfig(**KW), dt=450.0))


@pytest.fixture(scope="module")
def traj(lm):
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
    for _ in range(2):
        tr = lm.step_nl(tr)
    return tr


def test_deep_sponge_nlm_stable(lm, traj):
    out = lm.step_nl(traj)
    for k in lm.prog_3d:
        assert bool(jnp.isfinite(out[k]).all()), k
    assert float(jnp.abs(out["u"]).max()) < 100.0


def test_deep_sponge_dot_product(lm, traj):
    rng = np.random.default_rng(0)
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


def test_sponge_bands_have_expected_structure(lm):
    """The traj kcoef must contain the k1/k2/k3 specials and the pert
    kcoef an 9-level del-2 prefix (dyn_core_nlm.F90:543-569,
    dyn_core_tlm.F90:835-920)."""
    from fv3jedi_lm_tpu.core.dyn_core import _kcoef, _kcoef_pert

    kc = _kcoef(lm.cfg.dyn, 24, jnp.float64)
    m = np.asarray(kc["nord0"]).reshape(-1)
    assert m[0]                       # k=1 special
    k2 = max(2, 9 - 1) - 1
    k3 = max(3, 9) - 1
    assert m[k2] and m[k3]
    assert not m[k3 + 1:].any()
    kp = _kcoef_pert(lm.cfg.dyn, 24, jnp.float64)
    mp = np.asarray(kp["nord0"]).reshape(-1)
    assert mp[:9].all() and not mp[9:].any()
