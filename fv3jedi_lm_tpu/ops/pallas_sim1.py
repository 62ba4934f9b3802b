"""SIM1 semi-implicit vertical solver as a Pallas TPU kernel.

The reference's hot per-column tridiagonal (SIM1_solver,
model/nh_utils_nlm.F90:1177-1310, non-MOIST_CAPPA): two Thomas solves
(semi-implicit pressure then vertical velocity) plus the hydrostatic
re-integration of dz.  The whole-array jnp formulation
(core/nh_core.sim1_solver) expresses the k-recurrences as lax.scan, which
on TPU pays per-iteration loop overhead and HBM round trips; here the
column is resident in VMEM — grid over tiles of 128 columns (lanes), k
sequential in the sublane dimension, carries in registers.

AD note: `pallas_call` has no automatic jvp/vjp, so the differentiated
(mixed/TLM/ADM) path keeps the jnp oracle; this kernel serves the
nonlinear trajectory propagation (step_nl / staged forward), which is
never differentiated through.  The jnp path doubles as the correctness
oracle (tests/test_pallas_sim1.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import RGAS

LANES = 128


def _sim1_kernel(dm_ref, pt_ref, pm_ref, pem_ref, w_ref, dz_ref, ws_ref,
                 pe_out, w_out, dz_out, pp_s, gam_s,
                 *, km, dt, kappa, p_fac):
    # km is static: the k recurrences are fully unrolled PYTHON loops so
    # every row index is static (Mosaic cannot dynamic-slice array VALUES)
    gama = 1.0 / (1.0 - kappa)
    t1g = gama * 2.0 * dt * dt
    rdt = 1.0 / dt
    capa1 = kappa - 1.0
    r3 = 1.0 / 3.0

    dm = dm_ref[:]                 # (km, L)
    dz1 = dz_ref[:]
    pt = pt_ref[:]
    w1 = w_ref[:]

    # NH pressure perturbation at layers (vectorized)
    pe_l = jnp.exp(gama * jnp.log(-dm / dz1 * RGAS * pt)) - pm_ref[:]

    g_rat = dm[:-1] / dm[1:]                       # (km-1, L)
    bb = jnp.concatenate([2.0 * (1.0 + g_rat),
                          jnp.full_like(dm[:1], 2.0)], axis=0)
    dd = jnp.concatenate([3.0 * (pe_l[:-1] + g_rat * pe_l[1:]),
                          3.0 * pe_l[-1:]], axis=0)

    # ---- Thomas solve for pp (edge pressure increments) ----
    pp_s[0, :] = jnp.zeros_like(dm[0])
    bet = bb[0]
    pp_s[1, :] = dd[0] / bet
    for k in range(2, km + 1):
        gam = g_rat[k - 2] / bet
        gam_s[k - 1, :] = gam
        bet = bb[k - 1] - gam
        pp_s[k, :] = (dd[k - 1] - pp_s[k - 1, :]) / bet
    for k in range(km, 1, -1):
        pp_s[k - 1, :] = pp_s[k - 1, :] - gam_s[k - 1, :] * pp_s[k, :]
    pp = pp_s[:]

    # ---- w solver ----
    aa = t1g / (dz1[:-1] + dz1[1:]) * (pem_ref[1:km, :] + pp[1:km])  # (km-1,L)
    bet = dm[0] - aa[0]
    w_out[0, :] = (dm[0] * w1[0] + dt * pp[1]) / bet
    for k in range(2, km):
        gam = aa[k - 2] / bet
        gam_s[k - 1, :] = gam
        bet = dm[k - 1] - (aa[k - 2] + aa[k - 1] + aa[k - 2] * gam)
        w_out[k - 1, :] = (dm[k - 1] * w1[k - 1]
                           + dt * (pp[k] - pp[k - 1])
                           - aa[k - 2] * w_out[k - 2, :]) / bet
    p1 = t1g / dz1[km - 1] * (pem_ref[km, :] + pp[km])
    gam_km = aa[km - 2] / bet
    gam_s[km - 1, :] = gam_km
    bet = dm[km - 1] - (aa[km - 2] + p1 + aa[km - 2] * gam_km)
    w_out[km - 1, :] = (dm[km - 1] * w1[km - 1]
                        + dt * (pp[km] - pp[km - 1])
                        - p1 * ws_ref[0, :]
                        - aa[km - 2] * w_out[km - 2, :]) / bet
    for k in range(km - 1, 0, -1):
        w_out[k - 1, :] = w_out[k - 1, :] - gam_s[k, :] * w_out[k, :]

    # ---- pe update (cumulative) and dz back-substitution ----
    pe_out[0, :] = jnp.zeros_like(dm[0])
    for k in range(km):
        pe_out[k + 1, :] = pe_out[k, :] + dm[k] * (
            w_out[k, :] - w1[k]) * rdt

    p1v = (pe_out[km - 1, :] + 2.0 * pe_out[km, :]) * r3
    dz_out[km - 1, :] = -dm[km - 1] * RGAS * pt[km - 1] * jnp.exp(
        capa1 * jnp.log(jnp.maximum(p_fac * pm_ref[km - 1, :],
                                    p1v + pm_ref[km - 1, :])))
    for k in range(km - 1, 0, -1):
        p1v = (pe_out[k - 1, :] + bb[k - 1] * pe_out[k, :]
               + g_rat[k - 1] * pe_out[k + 1, :]) * r3 - g_rat[k - 1] * p1v
        dz_out[k - 1, :] = -dm[k - 1] * RGAS * pt[k - 1] * jnp.exp(
            capa1 * jnp.log(jnp.maximum(p_fac * pm_ref[k - 1, :],
                                        p1v + pm_ref[k - 1, :])))


def sim1_solver_pallas(dt, dm2, pt2, pm2, pem, w2, dz2, ws, kappa,
                       p_fac=0.05, interpret=False):
    """Pallas SIM1: same contract as core/nh_core.sim1_solver —
    dm2/pt2/pm2/w2/dz2 (km, B), pem (km+1, B), ws (B,);
    returns (pe (km+1, B), w2_new, dz2_new)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    km, B = dm2.shape
    dtype = dm2.dtype
    # pad columns to a lane multiple; dz must stay negative in the padding
    Bp = ((B + LANES - 1) // LANES) * LANES
    padc = Bp - B

    def pad(x, fill):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padc)],
                       constant_values=fill)

    args = (pad(dm2, 1.0), pad(pt2, 250.0), pad(pm2, 1.0e4),
            pad(pem, 1.0e4), pad(w2, 0.0), pad(dz2, -1.0),
            pad(ws.reshape(1, B), 0.0))

    grid = (Bp // LANES,)
    bspec_k = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    kern = functools.partial(_sim1_kernel, km=km, dt=float(dt),
                             kappa=float(kappa), p_fac=float(p_fac))
    pe, w_new, dz_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec_k(km), bspec_k(km), bspec_k(km), bspec_k(km + 1),
                  bspec_k(km), bspec_k(km), bspec_k(1)],
        out_specs=(bspec_k(km + 1), bspec_k(km), bspec_k(km)),
        out_shape=(jax.ShapeDtypeStruct((km + 1, Bp), dtype),
                   jax.ShapeDtypeStruct((km, Bp), dtype),
                   jax.ShapeDtypeStruct((km, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((km + 1, LANES), dtype),
                        pltpu.VMEM((km, LANES), dtype)],
        interpret=interpret,
    )(*args)
    return pe[:, :B], w_new[:, :B], dz_new[:, :B]
