"""Omega (vertical pressure velocity) diagnostics (VERDICT r3 item 7).

The reference's default use_old_omega path: pem captured at the start of the
last acoustic substep, omga = (pe - pem)*rdt + adv_pe advective term
(dyn_core_nlm.F90:378-392, 969-982, 1263-1364), remapped to the new
mid-levels in log-p (fv_mapz_nlm.F90:445-541) and filtered nf_omega times
with del2_cubed(0.18*da_min) (fv_dynamics_nlm.F90:627-629).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel


def _lm(compute_omega):
    cfg = LMConfig(dyn=DynConfig(npx=13, npy=13, npz=16, n_split=2,
                                 k_split=2, compute_omega=compute_omega),
                   dt=900.0)
    return LinearModel.create(cfg)


@pytest.fixture(scope="module")
def lm():
    return _lm(True)


def test_rest_atmosphere_omega_zero(lm):
    """An isothermal resting atmosphere has no vertical motion: omga must
    vanish to rounding."""
    out = lm.step_nl(lm.rest_traj(t0=280.0))
    assert "omga" in out
    om = np.asarray(out["omga"])
    assert np.isfinite(om).all()
    assert np.abs(om).max() < 1e-10


def test_stirred_omega_finite_nonzero(lm):
    tr = lm.rest_traj(t0=280.0)
    npz = lm.cfg.dyn.npz
    ks = np.arange(npz)[:, None, None, None] / (npz - 1.0)
    rng = np.random.default_rng(3)
    tr = dict(tr,
              u=tr["u"] + jnp.asarray(
                  3.0 * np.sin(2 * np.pi * ks) * np.ones(tr["u"].shape)),
              v=tr["v"] + jnp.asarray(
                  0.3 * rng.standard_normal(tr["v"].shape)))
    out = lm.step_nl(tr)
    om = np.asarray(out["omga"])
    assert np.isfinite(om).all()
    assert np.abs(om).max() > 1e-6
    # the del2 filter + remap must not manufacture extreme values: a few
    # m/s of stirring cannot produce tens of Pa/s in one step
    assert np.abs(om).max() < 50.0


def test_flag_off_no_omga_and_rounding_level_progs(lm):
    """compute_omega=False produces no omga key; the flag only unrolls the
    last acoustic substep out of the scan, so prognostic fields agree with
    the flagged run to fusion-rounding level."""
    lm0 = _lm(False)
    tr = lm.rest_traj(t0=280.0)
    npz = lm.cfg.dyn.npz
    ks = np.arange(npz)[:, None, None, None] / (npz - 1.0)
    tr = dict(tr, u=tr["u"] + jnp.asarray(
        3.0 * np.sin(2 * np.pi * ks) * np.ones(tr["u"].shape)))
    out1 = lm.step_nl(tr)
    out0 = lm0.step_nl(tr)
    assert "omga" not in out0
    for k in ("u", "v", "t", "delp", "qv"):
        a, b = np.asarray(out1[k]), np.asarray(out0[k])
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() / scale < 1e-12, k
