"""Joint mapn_tracer (fv_mapz_nlm.F90:1425-1539) + fillz
(fv_fill_nlm.F90:32-135) gates."""

import jax
import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu.ops.fv_mapz import fillz, map1_q2, mapn_tracer


def _coords(km, ncol, seed):
    rng = np.random.default_rng(seed)
    pe1 = np.sort(rng.random((km + 1, ncol)), axis=0) * 9.0e4 + 100.0
    pe1[0] = 100.0
    pe1[-1] = 1.0e5
    frac = np.sort(rng.random((km - 1, ncol)), axis=0)
    pe2 = np.concatenate([pe1[:1], 100.0 + frac * (1.0e5 - 100.0),
                          pe1[-1:]], axis=0)
    return jnp.asarray(pe1), jnp.asarray(pe2)


def test_mapn_matches_per_tracer_map1():
    """The shared-geometry joint remap must equal the per-tracer path — the
    reference shares k0/l/pl/pr across iq but computes identical values."""
    km, ncol, nq = 12, 30, 6
    pe1, pe2 = _coords(km, ncol, 0)
    rng = np.random.default_rng(1)
    q = jnp.asarray(np.abs(rng.standard_normal((nq, km, ncol))) * 1e-3)
    got = mapn_tracer(pe1, q, pe2, 8, q_min=0.0)
    for iq in range(nq):
        want = map1_q2(pe1, q[iq], pe2, 8, q_min=0.0)
        np.testing.assert_allclose(np.asarray(got[iq]), np.asarray(want),
                                   rtol=1e-13, atol=1e-18)


def test_mapn_per_tracer_kords():
    km, ncol = 10, 8
    pe1, pe2 = _coords(km, ncol, 2)
    rng = np.random.default_rng(3)
    q = jnp.asarray(np.abs(rng.standard_normal((3, km, ncol))) * 1e-3)
    got = mapn_tracer(pe1, q, pe2, [8, 9, 17], q_min=0.0)
    assert bool(jnp.isfinite(got).all())
    w17 = map1_q2(pe1, q[2], pe2, 17, q_min=0.0)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(w17),
                               rtol=1e-13, atol=1e-18)


def test_fillz_noop_on_positive():
    km, ncol = 8, 5
    rng = np.random.default_rng(4)
    q = jnp.asarray(np.abs(rng.standard_normal((km, ncol))) + 0.1)
    dp = jnp.asarray(1.0 + rng.random((km, ncol)))
    out = fillz(q, dp)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


def test_fillz_fixes_negatives_conservatively():
    """Negatives are removed; column mass sum(q*dp) over the fixed region
    is conserved when enough positive mass exists."""
    km, ncol = 10, 6
    rng = np.random.default_rng(5)
    q = np.abs(rng.standard_normal((km, ncol))) * 1e-3 + 1e-4
    dp = 1.0 + rng.random((km, ncol))
    q[4, :3] = -2e-4          # interior negatives
    q[-1, 3] = -1e-4          # bottom negative
    q[0, 4] = -1e-4           # top negative
    mass0 = (q * dp).sum(0)
    out = np.asarray(fillz(jnp.asarray(q), jnp.asarray(dp)))
    assert out.min() >= 0.0
    mass1 = (out * dp).sum(0)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)


def test_mapn_fill_pass():
    """fill=True produces non-negative tracers even from oscillatory
    profiles remapped with an aggressive kord."""
    km, ncol = 12, 10
    pe1, pe2 = _coords(km, ncol, 6)
    rng = np.random.default_rng(7)
    # signed field (winds-like) so the remap can produce small negatives,
    # then fill with q_min=0 semantics
    q = jnp.asarray(rng.standard_normal((2, km, ncol)) * 1e-3 + 2e-3)
    got = mapn_tracer(pe1, q, pe2, 8, q_min=-jnp.inf, fill=True)
    assert bool(jnp.isfinite(got).all())
