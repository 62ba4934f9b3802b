"""2-D finite-volume transport operator (fv_tp_2d) and del-n damping fluxes.

Re-derivation of model/tp_core_nlm.F90:78-210 (`fv_tp_2d`) and :1015-1166
(`deln_flux`) in whole-array JAX form.

Conventions (n = cells per side, ng = halo width, jc = n+2ng):
  q      (..., 6, jc, jc)   padded, halo-filled scalar
  crx    (..., 6, jc, n+1)  courant numbers at x-edges (all rows)
  xfx    (..., 6, jc, n+1)  area flux at x-edges
  cry    (..., 6, n+1, jc)  courant at y-edges (all columns)
  yfx    (..., 6, n+1, jc)
  ra_x   (..., 6, jc, n)
  ra_y   (..., 6, n, jc)
returns (fx, fy): (..., 6, n, n+1) and (..., 6, n+1, n).

`grid` is a dict of device arrays from metrics (area, rarea, dxa, dya,
del6_u, del6_v, da_min).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..parallel import halo
from . import ppm


def fv_tp_2d(q, crx, cry, hord, xfx, yfx, grid, topo, ra_x, ra_y,
             mfx=None, mfy=None, mass=None, nord=None, damp_c=None,
             damp_k=None):
    """2-D PPM transport; optional del-n damping.

    Damping is selected one of two ways:
    * scalar `nord`/`damp_c` (static): the reference's per-call coefficients;
    * `damp_k=(damp4_0_k, damp4_n_k, nord_n, nord0_mask)`: per-level damping
      for the masked single-trace dyn_core path — damp4_* are (npz,1,1,1)
      arrays, `nord0_mask` selects the del-2 variant per level (the sponge
      override of dyn_core_nlm.F90:536-630).
    """
    n = q.shape[-1] - 2 * NG
    if isinstance(hord, tuple):
        hm, hs, ksp = hord
        ord_in = (8 if hm == 10 else hm, 8 if hs == 10 else hs, ksp)
    else:
        ord_in = 8 if hord == 10 else hord
    ord_ou = hord

    dxa = grid["dxa"]
    dya = grid["dya"]
    area = grid["area"]

    q_y = halo.copy_corners(q, topo, 2)
    fy2 = ppm.yppm(q_y, cry, ord_in, dya)                    # (..., n+1, jc)
    fyy = yfx * fy2
    q_i = (
        q[..., NG:NG + n, :] * area[..., NG:NG + n, :] + fyy[..., :-1, :] - fyy[..., 1:, :]
    ) / ra_y
    fx = ppm.xppm(q_i, crx[..., NG:NG + n, :], ord_ou, dxa[..., NG:NG + n, :])

    q_x = halo.copy_corners(q, topo, 1)
    fx2 = ppm.xppm(q_x, crx, ord_in, dxa)                    # (..., jc, n+1)
    fx1 = xfx * fx2
    q_j = (
        q[..., :, NG:NG + n] * area[..., :, NG:NG + n] + fx1[..., :, :-1] - fx1[..., :, 1:]
    ) / ra_x
    fy = ppm.yppm(q_j, cry[..., :, NG:NG + n], ord_ou, dya[..., :, NG:NG + n])

    if mfx is not None and mfy is not None:
        fx = 0.5 * (fx + fx2[..., NG:NG + n, :]) * mfx
        fy = 0.5 * (fy + fy2[..., :, NG:NG + n]) * mfy
        if damp_k is not None:
            fx, fy = _deln_flux_masked(damp_k, q_x, fx, fy, grid, topo, mass)
        elif nord is not None and damp_c is not None and mass is not None:
            if damp_c > 1.0e-4:
                damp = (damp_c * grid["da_min"]) ** (nord + 1)
                fx, fy = deln_flux(nord, damp, q_x, fx, fy, grid, topo, mass=mass)
    else:
        fx = 0.5 * (fx + fx2[..., NG:NG + n, :]) * xfx[..., NG:NG + n, :]
        fy = 0.5 * (fy + fy2[..., :, NG:NG + n]) * yfx[..., :, NG:NG + n]
        if damp_k is not None:
            fx, fy = _deln_flux_masked(damp_k, q_x, fx, fy, grid, topo, None)
        elif nord is not None and damp_c is not None:
            if damp_c > 1.0e-4:
                damp = (damp_c * grid["da_min"]) ** (nord + 1)
                fx, fy = deln_flux(nord, damp, q_x, fx, fy, grid, topo)
    return fx, fy


def mask_band(mask0):
    """Static sponge-band split point from a STATIC (npz,1,1,1) numpy mask:
    returns (k0, mixed) — mask0 is all-False from level k0 on, and `mixed`
    says whether levels [0, k0) still need a per-level select (the traj
    sponge has isolated special levels, dyn_core_nlm.F90:543-569)."""
    import numpy as np

    m = np.asarray(mask0).reshape(-1)
    if not m.any():
        return 0, False
    k0 = int(np.nonzero(m)[0].max()) + 1
    return k0, not bool(m[:k0].all())


def _deln_flux_masked(damp_k, q_x, fx, fy, grid, topo, mass):
    """Per-level damping order/coefficient selection (the sponge bands of
    dyn_core_nlm.F90:536-630): the level batch is split STATICALLY at the
    band edge so the del-2 variant runs only on the sponge levels and the
    del-(2nord+2) variant only where selected — no double evaluation."""
    damp4_0, damp4_n, nord_n, mask0 = damp_k
    if nord_n == 0:
        return deln_flux(0, damp4_0, q_x, fx, fy, grid, topo, mass=mass)
    k0, mixed = mask_band(mask0)
    if k0 == 0:
        return deln_flux(nord_n, damp4_n, q_x, fx, fy, grid, topo, mass=mass)
    mA = None if mass is None else mass[:k0]
    fxA, fyA = deln_flux(0, damp4_0[:k0], q_x[:k0], fx[:k0], fy[:k0],
                         grid, topo, mass=mA)
    if mixed:
        fxn, fyn = deln_flux(nord_n, damp4_n[:k0], q_x[:k0], fx[:k0],
                             fy[:k0], grid, topo, mass=mA)
        fxA = jnp.where(mask0[:k0], fxA, fxn)
        fyA = jnp.where(mask0[:k0], fyA, fyn)
    if k0 == q_x.shape[0]:
        return fxA, fyA
    mB = None if mass is None else mass[k0:]
    fxB, fyB = deln_flux(nord_n, damp4_n[k0:], q_x[k0:], fx[k0:], fy[k0:],
                         grid, topo, mass=mB)
    return (jnp.concatenate([fxA, fxB], axis=0),
            jnp.concatenate([fyA, fyB], axis=0))


def _dx_flux(d2, del6_v, sign):
    """fx2(e) = del6_v(e) * sign * (d2(e) - d2(e-1)) at all x-edges [1, IC)."""
    ic = d2.shape[-1]
    out = jnp.zeros(d2.shape[:-1] + (ic + 1,), d2.dtype)
    diff = d2[..., 1:ic] - d2[..., 0:ic - 1]
    return out.at[..., 1:ic].set(sign * del6_v[..., 1:ic] * diff)


def _dy_flux(d2, del6_u, sign):
    ic = d2.shape[-2]
    out = jnp.zeros(d2.shape[:-2] + (ic + 1,) + d2.shape[-1:], d2.dtype)
    diff = d2[..., 1:ic, :] - d2[..., 0:ic - 1, :]
    return out.at[..., 1:ic, :].set(sign * del6_u[..., 1:ic, :] * diff)


def deln_flux(nord, damp, q, fx, fy, grid, topo, mass=None):
    """Del-n diffusive fluxes added to (fx, fy) (tp_core_nlm.F90:1015-1166).

    q must already be corner-copied in x (the state it has at the deln_flux
    call site inside fv_tp_2d).  fx: (..., n, n+1); fy: (..., n+1, n).
    """
    n = q.shape[-1] - 2 * NG
    del6_u = grid["del6_u"]   # (..., 6, jb, jc) at y-edges
    del6_v = grid["del6_v"]   # (..., 6, jc, jb) at x-edges
    rarea = grid["rarea"]

    d2 = q if mass is not None else damp * q

    if nord > 0:
        d2 = halo.copy_corners(d2, topo, 1)
    fx2 = _dx_flux(d2, del6_v, -1.0)   # del6_v*(d2(i-1)-d2(i))
    if nord > 0:
        d2 = halo.copy_corners(d2, topo, 2)
    fy2 = _dy_flux(d2, del6_u, -1.0)

    for _ in range(nord):
        d2 = (
            fx2[..., :, :-1] - fx2[..., :, 1:] + fy2[..., :-1, :] - fy2[..., 1:, :]
        ) * rarea
        d2 = halo.copy_corners(d2, topo, 1)
        fx2 = _dx_flux(d2, del6_v, +1.0)   # sign flips after first pass
        d2 = halo.copy_corners(d2, topo, 2)
        fy2 = _dy_flux(d2, del6_u, +1.0)

    fx2_c = fx2[..., NG:NG + n, NG:NG + n + 1]
    fy2_c = fy2[..., NG:NG + n + 1, NG:NG + n]
    if mass is not None:
        damp2 = 0.5 * damp
        mxl = mass[..., NG:NG + n, NG - 1:NG + n]
        mxr = mass[..., NG:NG + n, NG:NG + n + 1]
        fx = fx + damp2 * (mxl + mxr) * fx2_c
        myl = mass[..., NG - 1:NG + n, NG:NG + n]
        myr = mass[..., NG:NG + n + 1, NG:NG + n]
        fy = fy + damp2 * (myl + myr) * fy2_c
    else:
        fx = fx + fx2_c
        fy = fy + fy2_c
    return fx, fy
