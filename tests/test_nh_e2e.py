"""End-to-end nonhydrostatic gates (hydrostatic=False through LinearModel).

The op-level NH solver tests live in tests/test_nh.py; these certify the
full stepping path — dyn_core NH dispatch (update_dz_c + Riem_Solver_C on
the C step, update_dz_d + Riem_Solver3 on the D step, nh_p_grad;
model/dyn_core_nlm.F90:466-879), the NH vertical remap with kord_wz and
delz-as-specific-volume (model/fv_mapz_nlm.F90:421-588), and the staged
TLM/ADM with w/delz as prognostic perturbation fields
(model_tlmadm/fv_arrays_tlmadm.F90:94-128 wp/delzp).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel

NH_KW = dict(npx=13, npy=13, npz=10, n_split=2, k_split=1,
             d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3,
             n_sponge_pert=4, d2_bg_k1_pert=0.2, d2_bg_k2_pert=0.1,
             d2_bg_ks_pert=0.1, hydrostatic=False)


@pytest.fixture(scope="module")
def lm():
    return LinearModel.create(LMConfig(dyn=DynConfig(**NH_KW), dt=450.0))


def _spun_up(lm, nsteps=2):
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
    for _ in range(nsteps):
        tr = lm.step_nl(tr)
    return tr


@pytest.fixture(scope="module")
def traj(lm):
    return _spun_up(lm)


def _rand_pert(lm, seed):
    rng = np.random.default_rng(seed)
    scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6,
                 qi=1e-6, o3=1e-7, w=0.1, delz=1.0)
    return {k: jnp.asarray(rng.standard_normal(v.shape)) * scale[k]
            for k, v in lm.zero_pert().items()}


def _dot(lm, a, b):
    return sum(jnp.vdot(a[k], b[k]) for k in lm.prog_3d)


def test_nh_prognostics_present(lm):
    p = lm.zero_pert()
    assert "w" in p and "delz" in p
    assert "w" in lm.prog_3d and "delz" in lm.prog_3d


def test_nh_rest_state_stays_at_rest(lm):
    """A discretely balanced NH rest state must not self-accelerate: the
    Riemann solvers see zero pressure perturbation (lm.rest_traj builds
    delz in SIM1-discrete balance)."""
    tr = lm.rest_traj()
    out = lm.step_nl(tr)
    assert float(jnp.abs(out["u"]).max()) < 1e-8
    assert float(jnp.abs(out["w"]).max()) < 1e-8
    assert float(jnp.abs(out["t"] - 280.0).max()) < 1e-7
    dps = out["delp"].sum(0) - tr["delp"].sum(0)
    assert float(jnp.abs(dps).max()) < 1e-8


def test_nh_nlm_steps_finite_and_active(lm, traj):
    """The NH core evolves w/delz (they are not inert passengers)."""
    out = lm.step_nl(traj)
    for k in lm.prog_3d:
        assert bool(jnp.isfinite(out[k]).all()), k
    # the thermal bump must have driven vertical motion
    assert float(jnp.abs(out["w"]).max()) > 1e-8
    assert float(jnp.abs(out["delz"] - traj["delz"]).max()) > 1e-8


def test_nh_dot_product_identity(lm, traj):
    """<M dx, dy> == <dx, M^T dy> through the staged NH TLM/ADM (the gate
    VERDICT r4 measured by hand at 5.7e-16)."""
    dx = _rand_pert(lm, 1)
    dy = _rand_pert(lm, 2)
    mdx = lm.step_tl(traj, dx)
    mtdy = lm.step_ad(traj, dy)
    lhs = float(_dot(lm, mdx, dy))
    rhs = float(_dot(lm, dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


def test_nh_window_dot_product(lm, traj):
    """2-step window: the composed TL vs the reversed composed AD satisfy
    duality with NH prognostics.  Driven manually on the module-scope
    model (a second LinearModel's duplicate executables abort the
    long-running full-suite process — XLA CPU resource exhaustion)."""
    trajs = [traj, lm.step_nl(traj)]
    dx = _rand_pert(lm, 3)
    dy = _rand_pert(lm, 4)
    mdx = dx
    for tr in trajs:
        mdx = lm.step_tl(tr, mdx)
    mtdy = dy
    for tr in reversed(trajs):
        mtdy = lm.step_ad(tr, mtdy)
    lhs = float(_dot(lm, mdx, dy))
    rhs = float(_dot(lm, dx, mtdy))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-300)
    assert rel < 1e-12, (lhs, rhs, rel)


@pytest.fixture(autouse=True)
def no_persistent_cache(monkeypatch):
    """Serializing some NH adjoint executables for the persistent
    compilation cache ABORTS the process (CHECK failure inside
    jax compilation_cache.put_executable_and_time; config flips are
    ignored once the per-backend cache decision is made) — stub the
    write function for every test in this module.  NH programs recompile
    per suite run; reads of healthy cached entries still work."""
    from jax._src import compiler as _compiler

    monkeypatch.setattr(_compiler, "_cache_write",
                        lambda *a, **k: None)
    yield


def test_nh_multidevice_exact():
    """Sharded NH TL+AD == single-device NH TL+AD (exactness gate),
    executed in a FRESH subprocess: inside the long full-suite process
    the accumulated XLA CPU state makes this compile segfault, while the
    identical test passes standalone every time."""
    import subprocess
    import sys

    env = dict(os.environ, FV3LM_NH_MD="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         __file__ + "::test_nh_multidevice_exact_impl", "-x", "-q"],
        capture_output=True, text=True, env=env, timeout=3000)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


@pytest.mark.skipif(os.environ.get("FV3LM_NH_MD") != "1",
                    reason="run via the subprocess wrapper")
def test_nh_multidevice_exact_impl(lm, traj):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(devs.reshape(2, 2, 2), ("face", "y", "x"))
    dx = _rand_pert(lm, 5)
    dy = _rand_pert(lm, 6)
    tl_ref = lm.step_tl(traj, dx)
    ad_ref = lm.step_ad(traj, dy)

    sh3 = NamedSharding(mesh, P(None, "face", "y", "x"))
    sh2 = NamedSharding(mesh, P("face", "y", "x"))
    sh_u = NamedSharding(mesh, P(None, "face", None, "x"))
    sh_v = NamedSharding(mesh, P(None, "face", "y", None))

    def put(k, v):
        if k == "u":
            return jax.device_put(v, sh_u)
        if k == "v":
            return jax.device_put(v, sh_v)
        return jax.device_put(v, sh2 if v.ndim == 3 else sh3)

    # a fresh LM so no cached single-device executables/checkpoints reused
    lm_s = LinearModel.create(LMConfig(dyn=DynConfig(**NH_KW), dt=450.0))
    traj_s = {k: put(k, v) for k, v in traj.items()}
    dx_s = {k: put(k, v) for k, v in dx.items()}
    dy_s = {k: put(k, v) for k, v in dy.items()}
    with mesh:
        tl_s = lm_s.step_tl(traj_s, dx_s)
        ad_s = lm_s.step_ad(traj_s, dy_s)
    for k in lm.prog_3d:
        a, b = np.asarray(tl_ref[k]), np.asarray(tl_s[k])
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-12, ("tl", k)
        a, b = np.asarray(ad_ref[k]), np.asarray(ad_s[k])
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-12, ("ad", k)
