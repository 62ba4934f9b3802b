"""Pallas SIM1 kernel vs the jnp oracle (core/nh_core.sim1_solver).

On CPU the kernel runs in Pallas interpret mode; on a real TPU the
compiled kernel is exercised by scripts/bench_pallas_sim1.py."""

import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu.constants import KAPPA, RGAS
from fv3jedi_lm_tpu.core.nh_core import sim1_solver
from fv3jedi_lm_tpu.ops.pallas_sim1 import sim1_solver_pallas


def _inputs(km, ncol, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    pe_ref = np.linspace(100.0, 1.0e5, km + 1)
    dm2 = np.repeat((pe_ref[1:] - pe_ref[:-1])[:, None], ncol, 1)
    dm2 *= 1.0 + 0.05 * rng.random((km, ncol))
    pt2 = 250.0 + 30.0 * rng.random((km, ncol))
    pm2 = np.repeat((0.5 * (pe_ref[1:] + pe_ref[:-1]))[:, None], ncol, 1)
    pem = np.repeat(pe_ref[:, None], ncol, 1)
    grav = 9.80665
    dz2 = -(dm2 / grav) * RGAS * pt2 / pm2 * (
        1.0 + 0.02 * rng.random((km, ncol)))
    w2 = 0.5 * rng.standard_normal((km, ncol))
    ws = 0.1 * rng.standard_normal(ncol)
    c = lambda x: jnp.asarray(x, dtype)
    return tuple(map(c, (dm2, pt2, pm2, pem, w2, dz2, ws)))


def test_pallas_sim1_matches_jnp_oracle():
    km, ncol = 12, 200          # non-multiple of 128 exercises padding
    dm2, pt2, pm2, pem, w2, dz2, ws = _inputs(km, ncol, dtype=np.float64)
    dt = 30.0
    ref = sim1_solver(dt, dm2, pt2, pm2, pem, w2, dz2, ws, KAPPA, 0.05)
    got = sim1_solver_pallas(dt, dm2, pt2, pm2, pem, w2, dz2, ws, KAPPA,
                             0.05, interpret=True)
    for name, a, b in zip(("pe", "w", "dz"), ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


def test_pallas_sim1_f32():
    km, ncol = 10, 128
    dm2, pt2, pm2, pem, w2, dz2, ws = _inputs(km, ncol, seed=1)
    dt = 20.0
    ref = sim1_solver(dt, dm2, pt2, pm2, pem, w2, dz2, ws, KAPPA, 0.05)
    got = sim1_solver_pallas(dt, dm2, pt2, pm2, pem, w2, dz2, ws, KAPPA,
                             0.05, interpret=True)
    for name, a, b in zip(("pe", "w", "dz"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 1e-5, name
