"""Facade-level correctness gates (SURVEY.md section 4):

* TL/AD dot-product identity <M dx, dy> == <dx, M^T dy> with the
  reference-default split linearization options ON (the production
  configuration: pert advection hord_*_pert=2, pert remap kord_*_pert=17,
  split damping — fv_arrays_tlmadm.F90:37-92);
* split_* = False consistency: the TLM reduces to the exact jvp of the
  nonlinear step (fv_control_tlmadm.F90:220-252 — trajectory adopts the
  pert coefficients, so TLM == derivative of the one shared operator);
* TLM linearity/consistency against finite differences of the NLM;
* nonlinear rest-state stability + mass conservation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D

DYN_KW = dict(npx=13, npy=13, npz=10, n_split=2, k_split=1,
              d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3,
              n_sponge_pert=4, d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.1,
              d2_bg_ks_pert=0.1)


@pytest.fixture(scope="module")
def lm():
    """Production configuration: split linearization ON (reference default)."""
    return LinearModel.create(LMConfig(dyn=DynConfig(**DYN_KW), dt=450.0))


@pytest.fixture(scope="module")
def lm_nosplit():
    """split_* = False: traj adopts pert coefficients; TLM == jvp of NLM."""
    cfg = LMConfig(
        dyn=DynConfig(**DYN_KW, split_hord=False, split_kord=False,
                      split_damp=False, split_damp_tr=False),
        dt=450.0,
    )
    return LinearModel.create(cfg)


def _spun_up(lm):
    """Smooth spun-up trajectory.

    Grid-scale white noise puts a large fraction of upwind/limiter switches
    within eps of their thresholds, which wrecks finite-difference TLM
    validation (the operator is only piecewise differentiable).  Start from
    a smooth large-scale thermal anomaly and spin winds up with a few
    nonlinear steps instead — the standard TLM-validation setup.
    """
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
    tr["qv"] = tr["qv"] + 1e-3 * jnp.asarray(
        1.0 + np.sin(2.0 * np.pi * (ii + jj) / n + faces)
    ) * jnp.ones((npz, 1, 1, 1))
    for _ in range(3):
        tr = lm.step_nl(tr)
    return tr


@pytest.fixture(scope="module")
def traj(lm):
    return _spun_up(lm)


@pytest.fixture(scope="module")
def traj_nosplit(lm_nosplit):
    return _spun_up(lm_nosplit)


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    p = lm.zero_pert()
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in p.items()}


def _dot(a, b):
    return sum(jnp.vdot(a[k], b[k]) for k in PROG_3D)


def test_rest_state_stays_at_rest(lm):
    tr = lm.rest_traj()
    out = lm.step_nl(tr)
    assert float(jnp.abs(out["u"]).max()) < 1e-10
    assert float(jnp.abs(out["t"] - 280.0).max()) < 1e-9
    # mass conservation: surface pressure unchanged at machine precision
    dps = out["delp"].sum(0) - tr["delp"].sum(0)
    assert float(jnp.abs(dps).max()) < 1e-8


def test_dot_product_identity(lm, traj):
    """<M dx, dy> == <dx, M^T dy> to near machine precision (f64), with the
    reference-default split linearization ON."""
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_dot_product_identity_nosplit(lm_nosplit, traj_nosplit):
    dx = _rand_pert(lm_nosplit, 5)
    dy = _rand_pert(lm_nosplit, 6)
    mdx = lm_nosplit.step_tl(traj_nosplit, dx)
    mtdy = lm_nosplit.step_ad(traj_nosplit, dy)
    lhs = float(_dot(mdx, dy))
    rhs = float(_dot(dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_nosplit_tl_is_jvp_of_nlm(lm_nosplit, traj_nosplit):
    """With split_* off the TLM is the exact jvp of the nonlinear step
    (up to frozen-branch tie lanes, which are measure-zero on this traj)."""
    lm = lm_nosplit
    traj = traj_nosplit
    dx = _rand_pert(lm, 7)
    tl = lm.step_tl(traj, dx)
    prog = {k: traj[k] for k in PROG_3D}
    _, jv = jax.jvp(lambda pr: lm._step_fn(pr, traj["phis"]), (prog,), (dx,))
    num = sum(float(jnp.sum((tl[k] - jv[k]) ** 2)) for k in PROG_3D)
    den = sum(float(jnp.sum(jv[k] ** 2)) for k in PROG_3D)
    assert (num / max(den, 1e-300)) ** 0.5 < 1e-10


def test_tlm_linearity(lm_nosplit, traj_nosplit):
    """||M(x + e dx) - M(x) - e M' dx|| / (e ||M' dx||) -> O(e), in the
    split-off configuration where the TLM is the NLM derivative."""
    lm = lm_nosplit
    traj = traj_nosplit
    dx = _rand_pert(lm, 3)
    base = lm.step_nl(traj)
    tl = lm.step_tl(traj, dx)

    def rel_err(eps):
        pert_traj = dict(traj)
        for k in PROG_3D:
            pert_traj[k] = traj[k] + eps * dx[k]
        stepped = lm.step_nl(pert_traj)
        num = 0.0
        den = 0.0
        for k in PROG_3D:
            diff = (stepped[k] - base[k]) / eps - tl[k]
            num += float(jnp.sum(diff * diff))
            den += float(jnp.sum(tl[k] * tl[k]))
        return (num / max(den, 1e-300)) ** 0.5

    e1 = rel_err(1e-4)
    e2 = rel_err(1e-6)
    assert e1 < 1e-2, e1
    # The NLM is only piecewise differentiable (upwind switches flip
    # branches under any finite eps), so the FD error has a switch-noise
    # floor and cannot shrink linearly in eps forever.  Require only that
    # the error does not grow as eps shrinks; exact TL/AD correctness is
    # covered by the dot-product identity test.
    assert e2 < max(1.2 * e1, 1e-7), (e1, e2)


def test_adjoint_of_tl_is_involutive(lm, traj):
    """<M^T y, M^T y> > 0 and matches <y, M M^T y> through the identity."""
    dy = _rand_pert(lm, 4)
    mtdy = lm.step_ad(traj, dy)
    m_mtdy = lm.step_tl(traj, mtdy)
    lhs = float(_dot(mtdy, mtdy))
    rhs = float(_dot(m_mtdy, dy))
    assert lhs > 0.0
    assert abs(lhs - rhs) / lhs < 1e-12
