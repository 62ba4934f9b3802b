"""Per-operator unit/golden tests (VERDICT r3 item 7): localize regressions
to the operator layer instead of only surfacing them as facade-level
dot-product failures.

* map1_ppm: mass conservation + constant preservation across coordinate
  changes (fv_mapz_nlm.F90:1332 contract);
* fv_tp_2d: a spatially constant tracer stays constant under any
  divergence-free transport (tp_core_nlm.F90:78 contract);
* xppm iord 1/2: constant-field flux identity;
* a frozen-golden acoustic substep at c12L6: fingerprints of every carry
  field after one substep (covers c_sw, geopk, p_grad_c, d_sw, one_grad_p
  together); regenerate with `python tests/test_operators.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel
from fv3jedi_lm_tpu.ops import fv_mapz
from fv3jedi_lm_tpu.ops.ppm import xppm


def _coords(km, b, seed):
    rng = np.random.default_rng(seed)
    ps = 1.0e5 * (1.0 + 0.05 * rng.standard_normal(b))
    kp = np.linspace(0.0, 1.0, km + 1)[:, None]
    pe1 = 1.0 + (ps[None, :] - 1.0) * kp ** 1.2
    pe2 = 1.0 + (ps[None, :] - 1.0) * kp ** 1.0
    return jnp.asarray(pe1), jnp.asarray(pe2)


@pytest.mark.parametrize("kord", [8, 17])
def test_map1_ppm_conserves_mass(kord):
    km, b = 16, 12
    pe1, pe2 = _coords(km, b, 3)
    rng = np.random.default_rng(4)
    q = jnp.asarray(1.0 + 0.5 * rng.random((km, b)))
    out = fv_mapz.map1_ppm(pe1, q, None, pe2, 0, kord)
    m1 = jnp.sum(q * (pe1[1:] - pe1[:-1]), axis=0)
    m2 = jnp.sum(out * (pe2[1:] - pe2[:-1]), axis=0)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)


@pytest.mark.parametrize("kord", [8, 17])
def test_map1_ppm_preserves_constants(kord):
    km, b = 16, 12
    pe1, pe2 = _coords(km, b, 5)
    q = jnp.full((km, b), 3.25)
    out = fv_mapz.map1_ppm(pe1, q, None, pe2, 0, kord)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-13)


@pytest.mark.parametrize("iord", [1, 2, 8])
def test_xppm_constant_field(iord):
    """Flux of a constant field equals the constant for any courant."""
    from fv3jedi_lm_tpu import NG
    n = 12
    ic = n + 2 * NG
    q = jnp.full((6, ic), 7.5)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(-0.9, 0.9, (6, n + 1)))
    dxa = jnp.ones((6, ic))
    flux = xppm(q, c, iord, dxa)
    np.testing.assert_allclose(np.asarray(flux), 7.5, rtol=1e-13)


def _tiny_lm():
    cfg = LMConfig(
        dyn=DynConfig(npx=13, npy=13, npz=6, n_split=1, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2,
                      n_sponge_pert=3),
        dt=450.0,
    )
    return LinearModel.create(cfg)


def _substep_carry(lm):
    """One acoustic substep at a deterministic c12L6 state."""
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
    stepper = lm._staged()
    s = stepper._stages
    prog = {k: tr[k] for k in lm.prog_3d}
    st, q = s["prep"](prog, tr["phis"])
    st2, dp1, carry = s["pre"](st)
    out = stepper._sub_traj(carry, dict(phis=st2["phis"]))
    return out


#: golden fingerprints: field -> (sum(|x|), x[k0, f2, j5, i7]); regenerate
#: by running this file as a script after an INTENDED numerics change
GOLD = {
    "u": (2076.136568096507, 0.0930696361105374),
    "v": (2050.675879956414, -0.7463773598801816),
    "delp": (194397630.62046403, 269.839254181057),
    "pt": (932587.1572487132, 69.95704428758438),
    "heat_source": (0.0, 0.0),
    "pe": (227841715.35400257, 46.423024559339176),
    "pkz": (91580.22588125561, 3.987304742918284),
}


def test_acoustic_substep_golden():
    """Fingerprint of every prognostic carry field after ONE acoustic
    substep — pins c_sw + geopk + p_grad_c + d_sw + one_grad_p jointly."""
    lm = _tiny_lm()
    out = _substep_carry(lm)
    got = {}
    for k, (s_want, v_want) in GOLD.items():
        x = np.asarray(out[k])
        idx = (min(2, x.shape[0] - 1), 2, 5, 7)
        got[k] = (float(np.abs(x).sum()), float(x[idx]))
        np.testing.assert_allclose(got[k][0], s_want, rtol=1e-10,
                                   err_msg=f"{k} |sum|")
        np.testing.assert_allclose(got[k][1], v_want, rtol=1e-9,
                                   atol=1e-300, err_msg=f"{k} probe")


if __name__ == "__main__":
    # regenerate the golden fingerprints
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    lm = _tiny_lm()
    out = _substep_carry(lm)
    print("GOLD = {")
    for k in ("u", "v", "delp", "pt", "heat_source", "pe", "pkz"):
        x = np.asarray(out[k])
        idx = (min(2, x.shape[0] - 1), 2, 5, 7)
        print(f'    "{k}": ({float(np.abs(x).sum())!r}, {float(x[idx])!r}),')
    print("}")
