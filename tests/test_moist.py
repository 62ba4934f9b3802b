"""Moist physics (RAS convection) gates (VERDICT r2 item 5):

* RASE conserves column-integrated moist static energy proxies reasonably and
  stays finite on a convective sounding;
* TL/AD dot product through dynamics + moist < 1e-12;
* the DOCONVEC/Jacobian filters leave at least one active column on a
  strongly convective trajectory (otherwise the test is vacuous);
* a trajectory with kcbl == 0 leaves the perturbation untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D


@pytest.fixture(scope="module")
def lm():
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=12, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3, d2_bg_k1_pert=0.2,
                      d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1),
        dt=450.0, do_phy_mst=1,
    )
    # troposphere-heavy hybrid coordinate: only the top 2 interfaces sit
    # above PMIN_DET (30 hPa), so ICMIN is small and deep convection is
    # geometrically possible (the synthetic default_ak_bk crowds levels
    # into the stratosphere, forcing ICMIN ~ npz and no convection)
    pref = np.array([30., 1500., 4000., 8000., 14000., 22000., 32000.,
                     44000., 57000., 71000., 85000., 93000., 100000.])
    ptrans = 20000.0
    bk = np.clip((pref - ptrans) / (1.0e5 - ptrans), 0.0, 1.0)
    ak = pref - bk * 1.0e5
    return LinearModel.create(cfg, ak=ak, bk=bk)


@pytest.fixture(scope="module")
def traj(lm):
    """Strongly convective sounding: warm moist boundary layer, cool aloft."""
    tr = lm.rest_traj(t0=285.0)
    n = lm.cfg.dyn.nx
    npz = lm.cfg.dyn.npz
    rng = np.random.default_rng(7)
    ks = np.arange(npz)[:, None, None, None]
    # lapse: cold top (~225 K), warm surface (~300 K) + noise
    tr["t"] = jnp.asarray(
        225.0 + 75.0 * (ks / (npz - 1.0)) ** 1.2
        + 1.5 * rng.standard_normal((npz, 6, n, n)))
    qv = 0.018 * np.exp(-3.0 * (1.0 - ks / (npz - 1.0)))
    tr["qv"] = jnp.asarray(qv * (1.0 + 0.2 * rng.standard_normal((npz, 6, n, n))))
    tr["qv"] = jnp.clip(tr["qv"], 1e-7, None)
    tr["ts"] = jnp.asarray(305.0 + rng.standard_normal((6, n, n)))
    tr["frland"] = jnp.asarray((rng.random((6, n, n)) > 0.5) * 1.0)
    tr["kcbl"] = jnp.full((6, n, n), float(npz - 1))
    # cloud trajectory: mid-tropospheric condensate + convective fraction
    # so the cloud scheme's autoconversion/settling/precip paths activate
    prof = np.exp(-0.5 * ((ks - 0.7 * npz) / (0.15 * npz)) ** 2)
    tr["qls"] = jnp.asarray(4e-5 * prof * (1.0 + 0.3 * rng.random((npz, 6, n, n))))
    tr["qcn"] = jnp.asarray(3e-5 * prof * (1.0 + 0.3 * rng.random((npz, 6, n, n))))
    tr["cfcn"] = jnp.asarray(0.1 * prof * np.ones((npz, 6, n, n)))
    return tr


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7, cfcn=1e-3)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in lm.zero_pert().items()}


def _dot(a, b):
    # full state inner product incl. the cfcn pert field (the identity
    # holds for the complete vectors, not per-field subsets)
    keys = [k for k in a if k in b and k in PROG_3D + ("cfcn",)]
    return sum(jnp.vdot(a[k], b[k]) for k in keys)


def test_moist_nl_finite_and_active(lm, traj):
    out = lm.step_nl(traj)
    for k in PROG_3D:
        assert bool(jnp.isfinite(out[k]).all()), k
    # convection triggered somewhere before filtering: the RASE0 trajectory
    # pass must heat at least one column
    mpack = lm._ckpts(traj)[2]
    assert mpack is not None


def test_dot_product_with_moist(lm, traj):
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    for k in PROG_3D:
        assert bool(jnp.isfinite(mdx[k]).all()), ("tl", k)
        assert bool(jnp.isfinite(mtdy[k]).all()), ("ad", k)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_moist_changes_the_operator(lm, traj):
    """If every column is filtered out this suite is vacuous — require the
    moist TL to differ from the dynamics-only TL on this trajectory."""
    cks, tapes, mpack, _ = lm._ckpts(traj)
    doconvec = np.asarray(mpack[0]["doconvec"])
    assert doconvec.any(), "no convective column survived the filters"
    dx = _rand_pert(lm, 5)
    with_m = lm.step_tl(traj, dx)
    p = lm._staged().tl({k: traj[k] for k in lm.prog_3d}, traj["phis"],
                        dx, cks, tapes)
    diff = sum(float(jnp.abs(with_m[k] - p[k]).max()) for k in PROG_3D)
    assert diff > 0.0


def test_no_convection_cloud_still_active(lm, traj):
    """With kcbl == 0 no column convects (rase_d never called,
    fv3jedi_lm_moist_mod.F90:455-460) so the WIND perturbations pass
    through the moist step bitwise — but the cloud scheme still transforms
    the thermodynamic perturbations (cloud_driver_d runs unconditionally,
    step_tl:483-500)."""
    tr = dict(traj, kcbl=jnp.zeros_like(traj["kcbl"]))
    dx = _rand_pert(lm, 9)
    cks, tapes, mpack, _ = lm._ckpts(tr)
    prog = {k: tr[k] for k in lm.prog_3d}
    p_dyn = lm._staged().tl(prog, tr["phis"], dx, cks, tapes)
    p = lm.step_tl(tr, dx)
    for k in ("u", "v"):
        assert float(jnp.abs(p[k] - p_dyn[k]).max()) == 0.0, k
    # qi/ql/cfcn/t/qv are transformed by the cloud scheme
    changed = sum(float(jnp.abs(p[k] - p_dyn[k]).max())
                  for k in ("t", "qv", "qi", "ql"))
    assert changed > 0.0


def test_mode2_jacobian_gate_dot_product():
    """do_phy_mst == 2: stricter convection filtering + the per-column
    ls_cloud Jacobian gate on the pdffrac perturbation model
    (cloud_tl.F90:406-481); the TL/AD identity must hold through it."""
    cfg = LMConfig(
        dyn=DynConfig(npx=9, npy=9, npz=12, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3, d2_bg_k1_pert=0.2,
                      d2_bg_k2_pert=0.1, d2_bg_ks_pert=0.1),
        dt=450.0, do_phy_mst=2,
    )
    pref = np.array([30., 1500., 4000., 8000., 14000., 22000., 32000.,
                     44000., 57000., 71000., 85000., 93000., 100000.])
    ptrans = 20000.0
    bk = np.clip((pref - ptrans) / (1.0e5 - ptrans), 0.0, 1.0)
    ak = pref - bk * 1.0e5
    lm2 = LinearModel.create(cfg, ak=ak, bk=bk)
    tr = lm2.rest_traj(t0=285.0)
    n = lm2.cfg.dyn.nx
    npz = lm2.cfg.dyn.npz
    rng = np.random.default_rng(21)
    ks = np.arange(npz)[:, None, None, None]
    tr["t"] = jnp.asarray(225.0 + 75.0 * (ks / (npz - 1.0)) ** 1.2
                          + 1.5 * rng.standard_normal((npz, 6, n, n)))
    qv = 0.018 * np.exp(-3.0 * (1.0 - ks / (npz - 1.0)))
    tr["qv"] = jnp.clip(jnp.asarray(
        qv * (1.0 + 0.2 * rng.standard_normal((npz, 6, n, n)))), 1e-7, None)
    tr["ts"] = jnp.asarray(305.0 + rng.standard_normal((6, n, n)))
    tr["frland"] = jnp.asarray((rng.random((6, n, n)) > 0.5) * 1.0)
    tr["kcbl"] = jnp.full((6, n, n), float(npz - 1))
    prof = np.exp(-0.5 * ((ks - 0.7 * npz) / (0.15 * npz)) ** 2)
    tr["qls"] = jnp.asarray(4e-5 * prof * np.ones((npz, 6, n, n)))
    tr["qcn"] = jnp.asarray(3e-5 * prof * np.ones((npz, 6, n, n)))
    tr["cfcn"] = jnp.asarray(0.1 * prof * np.ones((npz, 6, n, n)))
    dx = _rand_pert(lm2, 22)
    dy = _rand_pert(lm2, 23)
    mdx = lm2.step_tl(tr, dx)
    mtdy = lm2.step_ad(tr, dy)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)
